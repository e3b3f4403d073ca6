"""Ray-Data-native medallion feature-engineering engine over transcript tables.

A from-scratch re-expression of the capabilities of the reference repo
``patrick-cst1/AWS-Batch-Realtime-Medallion-ML-Feature-Platform-Pipeline``
(a Spark-on-EMR-Serverless medallion pipeline; see SURVEY.md) as idiomatic
``ray.data.Dataset`` pipelines:

- ``sources``   — Parquet / gzip-NDJSON readers, transcript derivation + generator
- ``functions`` — pure vectorized numpy/pyarrow kernels (rolling windows,
                  sessionization, hashing, text analysis)
- ``stages``    — ``map_batches`` / keyed-``map_groups`` stage builders
- ``pipelines`` — bronze→silver→gold stream job, daily dataset build
- ``state``     — lineage manifests, resume, online (latest-per-entity) table

Everything is built on public Ray Data + Apache Arrow APIs only.
"""

__version__ = "0.1.0"
