from litepi_tpu.pipeline.two_stage import TwoStagePipeline

__all__ = ["TwoStagePipeline"]
