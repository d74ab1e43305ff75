"""Host-side input/output: image/video codecs, preprocessing, .flo files.

Equivalent of the reference's load.py.  All arrays are NHWC float32 in the
Caffe-BGR space (x*255, RGB->BGR, mean [103.939, 116.779, 123.68] subtracted;
reference load.py:21-32).
"""

from .image import (
    CAFFE_MEAN,
    preprocess,
    load_u8,
    deprocess,
    save_image,
    save_tensor_to_file,
    process_style_images,
)
from .video import preprocess_video, save_video, process_style_videos
from .flo import read_flo, write_flo, flow_warp_map

__all__ = [
    "CAFFE_MEAN",
    "preprocess",
    "deprocess",
    "save_image",
    "save_tensor_to_file",
    "process_style_images",
    "preprocess_video",
    "save_video",
    "process_style_videos",
    "read_flo",
    "write_flo",
    "flow_warp_map",
]
