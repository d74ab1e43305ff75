#!/usr/bin/env python
"""Reference-compatible entry point: `python style_cli.py --content ... --style ...`
(equivalent of the reference's `python style.py`, which maps to
`python -m maua_style_tpu.style`)."""
from maua_style_tpu.style import main

if __name__ == "__main__":
    main()
