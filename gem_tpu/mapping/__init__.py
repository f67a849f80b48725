from gem_tpu.mapping.pipeline import (  # noqa: F401
    Frame,
    PipelineState,
    StepOutputs,
    ElevationPipeline,
    init_pipeline_state,
    step,
)
