from .bundle import Bundle, BundleArrays, load_bundle, ensure_bundle
from .timing import StepTimer
