from .run import run_macro_only
