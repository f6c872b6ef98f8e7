from distributed_mapreduce_p2p_spark.sources.io import (  # noqa: F401
    files_split_size,
    load_tables,
    read_table,
    read_text_corpus,
    write_hash_partitioned,
    write_merged_result,
    write_sorted_partitions,
)
