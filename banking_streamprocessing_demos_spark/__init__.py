"""PySpark-native analytics engine with the query and data-processing
capabilities of the ``cjmatta/banking-streamprocessing-demos`` reference.

Built Spark-first: the reference's embedded relational workload becomes
DataFrame/Spark SQL plans optimized by Catalyst; its event-lifecycle
simulation becomes a seeded deterministic generator; its specified (but
unimplemented) undelivered-message detector becomes a Structured
Streaming stateful job.  Beyond the reference surface, the engine adds
LLM-data-pipeline operators (deduplication, similarity search, text
analysis, multimodal column plumbing) designed for 100 TB scale.

Blueprint: repo-root ``SURVEY.md``.  Reference citations in docstrings
are ``file:line`` into ``/root/reference/``.
"""

__version__ = "0.1.0"
