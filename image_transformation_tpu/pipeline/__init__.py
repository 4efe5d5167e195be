from .engine import ComposeEngine
from .fused import fused_multi_ratio_render, make_fused_render, make_sharded_fused_render
from .run import PipelineError, run_macro_only
