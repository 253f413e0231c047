"""relex_spark — a PySpark-native knowledge-graph construction engine.

Re-expresses the data-processing semantics of DFKI-NLP/RelEx (sentence-level
relation classification: mention/entity-pair handling, offset-based relation
scoring in SemEval-2010 Task 8 / TACRED schemas) as declarative DataFrame
stages plus Arrow-vectorized scoring kernels, over a transcript table
``(conv_id, turn_idx, role, text, tool, ts)``.

Design rules (enforced across the package):

* DataFrame/SQL first — every stage that CAN be a Catalyst expression IS one
  (whole-stage codegen, predicate pushdown, column pruning for free).
* Python only at the Arrow boundary — ``mapInPandas`` / ``pandas_udf``; there
  are **no per-row Python UDFs** anywhere.
* Broadcast small, shuffle big — gazetteers/vocabs/weights are broadcast;
  joins and aggregations shuffle only on real keys; skew handled by salting
  + AQE.
"""

__version__ = "0.1.0"

from relex_spark.session import get_spark  # noqa: F401
