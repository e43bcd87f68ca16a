from gnocchi_spark.functions.aggregates import agg_expr  # noqa: F401
from gnocchi_spark.functions.timeutil import truncate_to_bucket  # noqa: F401
