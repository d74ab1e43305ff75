#!/usr/bin/env python
"""Reference-compatible entry point (see maua_style_tpu/pipelines/clip_video_style.py)."""
from maua_style_tpu.pipelines.clip_video_style import main

if __name__ == "__main__":
    main()
