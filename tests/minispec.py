"""A scaled-down YOLOv3-shaped graph for fast CPU tests.

Exercises every layer type the full model uses (conv+BN+leaky, stride-2
downsampling, shortcut, route, upsample, linear head convs, 3 yolo scales)
with small channel counts so compile time stays tractable on the 1-core CPU
test runner.  Structure mirrors yolov3_spec's builder at 1/16 width and
1 residual block per stage.
"""

from amyloid_yolo_tpu.graphspec import NetInfo, _Builder, YOLOV3_MASKS


def mini_spec(num_classes: int = 2, img_size: int = 64):
    b = _Builder(NetInfo(width=img_size, height=img_size))
    hf = 3 * (5 + num_classes)

    def res(f):
        b.conv(f // 2, 1)
        b.conv(f, 3)
        b.shortcut(-3)

    b.conv(4, 3)
    b.conv(8, 3, stride=2)
    res(8)
    b.conv(16, 3, stride=2)
    res(16)
    r8 = b.i - 1
    b.conv(32, 3, stride=2)
    res(32)
    r16 = b.i - 1
    b.conv(64, 3, stride=2)
    res(64)

    b.conv(32, 1)
    b.conv(64, 3)
    b.conv(hf, 1, bn=False, act="linear")
    b.yolo(YOLOV3_MASKS[0], num_classes)

    b.route([-4])
    b.conv(16, 1)
    b.upsample(2)
    b.route([-1, r16])
    b.conv(16, 1)
    b.conv(32, 3)
    b.conv(hf, 1, bn=False, act="linear")
    b.yolo(YOLOV3_MASKS[1], num_classes)

    b.route([-4])
    b.conv(8, 1)
    b.upsample(2)
    b.route([-1, r8])
    b.conv(8, 1)
    b.conv(16, 3)
    b.conv(hf, 1, bn=False, act="linear")
    b.yolo(YOLOV3_MASKS[2], num_classes)

    from amyloid_yolo_tpu.graphspec import _finish
    return _finish(b.net, b.layers, b.out_channels)
