"""eirepolitic_data_pipeline_spark — a from-scratch, PySpark-native analytics
engine with the query and data-processing capabilities of the reference
pipeline (eirepolitic/eirepolitic-data-pipeline), re-expressed Spark-first.

Architecture (see SURVEY.md §7):

- ``session``    — SparkSession factory tuned for AQE + local[N] testing.
- ``functions``  — scalar column-expression helpers (SURVEY §2.8 X1-X18) and
                   text-analysis expressions (lang-id, quality, tokens,
                   fingerprints).
- ``operators``  — reusable DataFrame-level operators: policy merges,
                   dedupe (exact / minhash-LSH / simhash / n-gram jaccard),
                   temporal interval logic, ranking/top-k, similarity search.
- ``sources``    — paginated REST connector with adaptive date-bisection,
                   Akoma-Ntoso-style XML corpus reader (mapInPandas).
- ``io``         — catalog layout (zones, snapshot partitions, immutable
                   batches + production pointer), readers/writers.
- ``plans``      — table registry (YAML → TableDef/StructType), DQ check
                   compiler, dataset contracts.
- ``streaming``  — Structured Streaming surface for the events table.

Everything is declared through the DataFrame/SQL API so Catalyst plans the
physical execution; custom code is library-level (no Catalyst extensions).
"""

__version__ = "0.1.0"
