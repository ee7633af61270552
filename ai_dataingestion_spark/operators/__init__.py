"""Operator library — importing this package registers every SURVEY.md §2
operator into the catalog (ai_dataingestion_spark.catalog)."""

from ai_dataingestion_spark.operators import (  # noqa: F401
    aggregates,
    analytics,
    extended,
    joins,
    projections,
    sets,
    sorts,
    windows,
)
from ai_dataingestion_spark import functions  # noqa: F401
from ai_dataingestion_spark import ai  # noqa: F401
from ai_dataingestion_spark import udf  # noqa: F401
from ai_dataingestion_spark import sources  # noqa: F401
from ai_dataingestion_spark import pipeline  # noqa: F401
from ai_dataingestion_spark import streaming  # noqa: F401
from ai_dataingestion_spark import plans  # noqa: F401

# Round-2+ additions import LAST: their registration indices append to the
# end of the rotation order, so they cannot displace the operators queued
# for the current driver correctness window (catalog._rotation_rank).
from ai_dataingestion_spark.operators import advanced  # noqa: F401
from ai_dataingestion_spark.operators import round5  # noqa: F401
from ai_dataingestion_spark.operators import round5b  # noqa: F401
from ai_dataingestion_spark.operators import round5c  # noqa: F401
from ai_dataingestion_spark.operators import round5d  # noqa: F401
from ai_dataingestion_spark.operators import round5e  # noqa: F401
from ai_dataingestion_spark.operators import round5f  # noqa: F401
from ai_dataingestion_spark.operators import round5g  # noqa: F401
from ai_dataingestion_spark.operators import round5h  # noqa: F401
from ai_dataingestion_spark.operators import round5i  # noqa: F401
from ai_dataingestion_spark.operators import round5j  # noqa: F401
from ai_dataingestion_spark.operators import round5k  # noqa: F401
from ai_dataingestion_spark.operators import round5l  # noqa: F401
from ai_dataingestion_spark.operators import round5m  # noqa: F401
from ai_dataingestion_spark.operators import round5n  # noqa: F401
from ai_dataingestion_spark.operators import round5o  # noqa: F401
from ai_dataingestion_spark.operators import round5p  # noqa: F401
from ai_dataingestion_spark.operators import round5q  # noqa: F401
from ai_dataingestion_spark.operators import round5r  # noqa: F401
from ai_dataingestion_spark.operators import round5s  # noqa: F401
from ai_dataingestion_spark.operators import round5t  # noqa: F401
from ai_dataingestion_spark.operators import round5u  # noqa: F401
from ai_dataingestion_spark.operators import round5v  # noqa: F401
from ai_dataingestion_spark.operators import round5w  # noqa: F401
from ai_dataingestion_spark.operators import round5x  # noqa: F401
from ai_dataingestion_spark.operators import round5y  # noqa: F401
from ai_dataingestion_spark.operators import round5z  # noqa: F401
from ai_dataingestion_spark.operators import round6a  # noqa: F401
from ai_dataingestion_spark.operators import round6b  # noqa: F401
from ai_dataingestion_spark.operators import round6c  # noqa: F401
from ai_dataingestion_spark.operators import round6d  # noqa: F401
from ai_dataingestion_spark.operators import round6e  # noqa: F401
from ai_dataingestion_spark.operators import round6f  # noqa: F401
from ai_dataingestion_spark.operators import round6g  # noqa: F401
from ai_dataingestion_spark.operators import round6h  # noqa: F401
from ai_dataingestion_spark.operators import round6i  # noqa: F401
from ai_dataingestion_spark.operators import round6j  # noqa: F401
from ai_dataingestion_spark.operators import round6k  # noqa: F401
from ai_dataingestion_spark.operators import round6l  # noqa: F401
from ai_dataingestion_spark.operators import round6m  # noqa: F401
from ai_dataingestion_spark.operators import round6n  # noqa: F401
from ai_dataingestion_spark.operators import round6o  # noqa: F401
from ai_dataingestion_spark.operators import round6p  # noqa: F401
from ai_dataingestion_spark.operators import round6q  # noqa: F401
from ai_dataingestion_spark.operators import round6r  # noqa: F401
from ai_dataingestion_spark.operators import round6s  # noqa: F401
from ai_dataingestion_spark.operators import round6t  # noqa: F401
from ai_dataingestion_spark.operators import round6u  # noqa: F401
from ai_dataingestion_spark.operators import round6v  # noqa: F401
from ai_dataingestion_spark.operators import round6w  # noqa: F401
from ai_dataingestion_spark.operators import round6x  # noqa: F401
from ai_dataingestion_spark.operators import round6y  # noqa: F401
from ai_dataingestion_spark.operators import round6z  # noqa: F401
from ai_dataingestion_spark.operators import round7a  # noqa: F401
from ai_dataingestion_spark.operators import round7b  # noqa: F401
from ai_dataingestion_spark.operators import round7c  # noqa: F401
from ai_dataingestion_spark.operators import round7d  # noqa: F401
from ai_dataingestion_spark.operators import round7e  # noqa: F401
