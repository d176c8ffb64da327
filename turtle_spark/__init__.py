"""turtle_spark — PySpark-native knowledge-graph construction engine.

A from-scratch implementation of the capabilities of nvkp/turtle
(Turtle 1.1 parse/serialize) re-expressed as a distributed pipeline:
Arrow-batched extraction over interleaved text+media documents,
MinHash-LSH entity linking, connected-components canonicalization, and
subject-hash-partitioned triple materialization.
"""

__version__ = "0.1.0"
