"""DataFrame-level operators.

Each module exposes QUERIES: dict[name, (spark, sf_dir) -> DataFrame]
and ORACLES: dict[name, ANSI-SQL string for DuckDB].  Every query is a
relational re-expression of a SURVEY §2 operator shape (cited per
function) or a training-data-pipeline operator (dedup / similarity /
text analysis) the engine adds beyond the reference.

Determinism contract with the oracle comparison: float aggregates go
through DECIMAL(18,6) sums (order-independent, exact in both engines);
oracle-compared floats are emitted as floor(x*1e6)/1e6 with threshold
filters on the UNFLOORED expression in both engines (ROUND ties break
HALF_UP in Spark vs half-even in DuckDB); window orderings always
carry a unique tie-break column.
"""

from . import curation, dedup, multimodal, relational, similarity, textstats, weburl

ALL_QUERIES: dict = {}
ALL_ORACLES: dict = {}
for _m in (relational, dedup, similarity, textstats, multimodal, curation, weburl):
    ALL_QUERIES.update(_m.QUERIES)
    ALL_ORACLES.update(_m.ORACLES)
