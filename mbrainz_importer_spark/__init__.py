"""mbrainz_importer_spark — a PySpark-native analytics/ETL engine.

A brand-new engine with the query and data-processing capabilities of the
reference ETL+query pipeline (Datomic's mbrainz-importer, see SURVEY.md):
streaming restartable imports with exactly-once semantics, enum/dimension
resolution with zero-miss guards, deterministic batching, nested
component assembly, an EAV/datalog query layer — plus the large-scale
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns) that a 100 TB Spark deployment needs.

Architecture is Spark-first: logical plans are declared with the DataFrame /
SQL API and optimized by Catalyst; Python UDFs appear only where built-ins
cannot express the semantics (and then always Arrow-vectorized).
"""

__version__ = "0.1.0"
