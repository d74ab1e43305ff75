"""Prebuild the native library: python -m maua_style_tpu.native.build"""

from . import build

if __name__ == "__main__":
    path = build(verbose=True)
    print(f"built {path}" if path else "build failed; numpy fallbacks remain active")
