"""PySpark-native analytics engine with the query and data-processing
capabilities of ``aayushjoshi16/distributed-mapreduce-p2p``.

The reference (read-only at /root/reference) is a Go distributed
MapReduce word-count engine on gossip membership + Raft election + a
P2P replicated result log. This package re-expresses every user-facing
capability (SURVEY.md §2) Spark-first:

- ``session``      — SparkSession factory tuned for the target scale.
- ``sources``      — batch + streaming sources/sinks (S1-S7, K1-K5).
- ``operators``    — text (P1, A1-A4, O1-O3), relational (P2-P5, O4,
                     J1-J3, H1-H2), dedup/similarity/textstats/
                     multimodal (north-star LLM-pipeline ops).
- ``functions``    — the pluggable Map/Reduce UDF surface (U1-U3).
- ``streaming``    — replicated-result-log analog (R1-R8) + windowed
                     event aggregation.
- ``plans``        — plan-inspection helpers (pushdown/broadcast
                     assertions used by tests).

Coordination machinery in the reference (mailbox RPC, gossip, Raft,
task tracker/WAL — SURVEY.md §2.10) is provided by the Spark runtime
itself and intentionally has no user-level code here.
"""

__version__ = "0.1.0"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
