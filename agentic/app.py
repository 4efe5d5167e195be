"""Agentic Streamlit entry (reference-compatible): streamlit run agentic/app.py."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent.resolve()))

from image_transformation_tpu.ui.agentic_app import main

main()
