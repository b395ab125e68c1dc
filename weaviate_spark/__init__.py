"""weaviate_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of weaviate/weaviate (reference studied at
/root/reference, snapshot 2026-08-07).

Design: declarative Spark DataFrame plans compiled from a QuerySpec IR
(mirroring weaviate's dto.GetParams / aggregation.Params), letting Catalyst
do predicate pushdown / column pruning / join selection, with custom stages
only where Spark lacks the semantics (BM25F stats, fusion, autocut, MMR).

Scale notes (100 TB target) live in docstrings of each operator module and
in SCALING.md.
"""

__version__ = "0.1.0"
