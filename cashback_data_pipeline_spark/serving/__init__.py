from cashback_data_pipeline_spark.serving.http_api import ServingApi

__all__ = ["ServingApi"]
