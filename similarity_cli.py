#!/usr/bin/env python
"""Reference-compatible entry point (see maua_style_tpu/pipelines/similarity.py)."""
from maua_style_tpu.pipelines.similarity import main

if __name__ == "__main__":
    main()
