"""Import side-effect module: pulls in every query-defining module so
``registry.QUERIES`` is fully populated. ``__spark_entry__`` and
``bench.py`` import this, not the individual modules."""

import etl_zero_spark.plans.registry  # noqa: F401  (core: scans/transforms/joins/aggs)
import etl_zero_spark.plans.analytics  # noqa: F401  (windows/set ops/grouping)
import etl_zero_spark.plans.events_queries  # noqa: F401  (event-time/json)
import etl_zero_spark.plans.northstar  # noqa: F401  (dedup/similarity/text/multimodal)
import etl_zero_spark.plans.streaming_queries  # noqa: F401  (availableNow streaming)

from etl_zero_spark.plans.registry import QUERIES  # noqa: F401
