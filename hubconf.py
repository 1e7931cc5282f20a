"""Hub entry point (reference hubconf.py analog).

Usage:
    import hubconf
    model = hubconf.yolov5s_city_seg(pretrained="pspv5s.pt")
    results = model(["data/images/bus.jpg"], size=1024)
    results.print(); results.save()
"""

from multiyolov5_tpu.hub import (  # noqa: F401
    AutoShape, Detections, create, custom,
    yolov5l, yolov5l6, yolov5m, yolov5m6, yolov5m_city_seg,
    yolov5s, yolov5s6, yolov5s_city_seg, yolov5x, yolov5x6)

dependencies = ["jax", "numpy"]


if __name__ == "__main__":
    import numpy as np

    model = yolov5s_city_seg(autoshape=True)
    imgs = ["/root/reference/data/images/zidane.jpg",
            np.zeros((320, 640, 3), np.uint8)]
    try:
        results = model(imgs, size=640)
        results.print()
    except FileNotFoundError:
        results = model([np.zeros((320, 640, 3), np.uint8)], size=640)
        results.print()
