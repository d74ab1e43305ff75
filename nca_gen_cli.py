#!/usr/bin/env python
"""Reference-compatible entry point (see maua_style_tpu/pipelines/nca_gen.py)."""
from maua_style_tpu.pipelines.nca_gen import main

if __name__ == "__main__":
    main()
