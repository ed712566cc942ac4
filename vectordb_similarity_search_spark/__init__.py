"""PySpark-native analytics engine with the capability surface of
``Abibabu28/vectordb_similarity_search`` (reference: a single-process
patient-similarity search simulation, ``/root/reference/similarity_search.py``).

Everything is expressed Spark-first: declarative DataFrame/SQL plans that
Catalyst can optimize (predicate pushdown, column pruning, broadcast joins,
two-phase top-k), with Pandas UDFs only where built-in operators genuinely
cannot express the semantics (batch model inference).

Subpackages
-----------
- ``sources``    : table loaders + synthetic generators (reference S1-S3)
- ``functions``  : column-expression libraries (vector math, text, hashing)
- ``operators``  : composite operators (top-k search, similarity join,
                   dedup, cohort stats, ANN)
- ``plans``      : the named query catalog backing ``__spark_entry__.py``
- ``streaming``  : Structured Streaming jobs over the events stream
- ``ml``         : embedding model (numpy MLP), FedAvg, pandas_udf scoring
"""

__version__ = "0.1.0"
