"""Query planning layer (SURVEY §4): the strategy choices Catalyst cannot
make for us — exact vs approximate path, filter placement, broadcast vs
blocked join shape, probe/overquery knobs."""

from jvector_spark.plans.planner import SearchPlan, plan_knn  # noqa: F401
