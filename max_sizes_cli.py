#!/usr/bin/env python
"""Reference-compatible entry point (the reference's max-sizes.py)."""
from maua_style_tpu.tuning.max_sizes import main

if __name__ == "__main__":
    main()
