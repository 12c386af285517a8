"""mister_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the public ``Jaymon/mister`` MapReduce
library, widened to a full relational / time-series / LLM-data-pipeline
operator suite (see SURVEY.md §2 for the coverage contract).

Reference note: at build time ``/root/reference`` was empty; parity targets
derive from the public ``Jaymon/mister`` repo (prepare/map/reduce job API)
as documented in SURVEY.md §1.
"""

from mister_spark.session import get_session
from mister_spark.catalog import Catalog
from mister_spark.registry import QUERIES, ORACLES, query

__all__ = ["get_session", "Catalog", "QUERIES", "ORACLES", "query"]
