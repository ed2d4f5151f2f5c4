from quickwit_spark.routing.siphash import siphash24, siphash24_batch
from quickwit_spark.routing.expression import RoutingExpr

__all__ = ["siphash24", "siphash24_batch", "RoutingExpr"]
