"""Streamlit entry point (reference-compatible): streamlit run app.py.

The UI implementation lives in image_transformation_tpu/ui/app.py; this
root module keeps the reference's launch command working
(/root/reference/app.py, /root/reference/Dockerfile CMD).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.resolve()))

from image_transformation_tpu.ui.app import main

main()
