from vaero_spark.streaming.engine import StreamingPipeline, run_streaming_plan  # noqa: F401
from vaero_spark.streaming.lineage import MetricsListener  # noqa: F401
