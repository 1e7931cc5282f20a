"""Model-config DSL compiler.

Reads the reference yaml model DSL (rows of ``[from, number, module, args]``,
reference models/yolov5s_city_seg.yaml and parse_model at models/yolo.py:373-429)
and compiles it into a static :class:`ModelSpec`: resolved per-layer channels,
depth/width-scaled args, the save-set of intermediate outputs, and analytic
strides.  Unlike the reference (which interprets layers through an nn.Sequential
at runtime and probes strides with a dry forward), the spec is a plain Python
datastructure walked once at trace time — XLA sees a flat fused graph.

Improvements over the reference kept deliberately:
  * detection-only configs (no ``n_segcls``) compile fine — the reference
    crashes on them (models/yolo.py:375 reads d['n_segcls'] unconditionally).
  * strides are derived analytically from the layer graph instead of a
    batch-2 dry run (needed there because SE-BN blocks can't run batch-1).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Union

from ..ops.nn import make_divisible

# Modules whose first arg is the output-channel count (reference yolo.py:389-390)
_CH_OUT_MODULES = {
    "Conv", "GhostConv", "Bottleneck", "GhostBottleneck", "SPP", "DWConv",
    "MixConv2d", "Focus", "CrossConv", "BottleneckCSP", "C3", "C3TR", "ASPP",
}
_REPEAT_INSERT = {"BottleneckCSP", "C3", "C3TR"}
_SEG_HEADS = {"SegMaskPSP", "SegMaskBase", "SegMaskBiSe", "SegMaskLab"}


@dataclass
class Row:
    i: int
    f: Union[int, List[int]]
    n: int                     # depth-scaled repeat count
    module: str
    args: List[Any]            # resolved args (post gd/gw scaling)
    c1: Union[int, List[int]]
    c2: int
    stride: int                # spatial downscale factor of the output


@dataclass
class ModelSpec:
    rows: List[Row]
    nc: int
    n_segcls: Optional[int]
    anchors: List[List[float]]
    strides: List[int]
    save: set = field(default_factory=set)
    detect_index: int = -1
    seg_index: Optional[int] = None
    names: List[str] = field(default_factory=list)
    yaml: Dict[str, Any] = field(default_factory=dict)
    ch_in: int = 3

    @property
    def na(self) -> int:
        return len(self.anchors[0]) // 2

    @property
    def nl(self) -> int:
        return len(self.anchors)


def _resolve_arg(a: Any, env: Dict[str, Any]) -> Any:
    """Resolve string args ('nc', 'anchors', 'None', 'nearest') like the
    reference's eval() (models/yolo.py:381-386) but without exec."""
    if isinstance(a, str):
        if a in env:
            return env[a]
        if a == "None":
            return None
        if a in ("True", "False"):
            return a == "True"
        try:
            return int(a)
        except ValueError:
            pass
        try:
            return float(a)
        except ValueError:
            pass
        return a  # e.g. 'nearest'
    return a


def compile_spec(d: Dict[str, Any], ch_in: int = 3, nc: Optional[int] = None,
                 anchors=None) -> ModelSpec:
    d = dict(d)
    if nc is not None:
        d["nc"] = nc
    if anchors is not None:
        d["anchors"] = anchors
    gd = d["depth_multiple"]
    gw = d["width_multiple"]
    anchors_ = d["anchors"]
    nc_ = d["nc"]
    n_segcls = d.get("n_segcls")
    na = (len(anchors_[0]) // 2) if isinstance(anchors_, list) else anchors_
    no = na * (nc_ + 5)
    env = {"nc": nc_, "anchors": anchors_, "n_segcls": n_segcls, "nn.SiLU()": "silu"}

    rows: List[Row] = []
    ch: List[int] = [ch_in]
    strides: List[int] = [1]
    save = set()
    detect_index = -1
    seg_index = None
    det_strides: List[int] = []

    for i, (f, n, m, args) in enumerate(d["backbone"] + d["head"]):
        args = [_resolve_arg(a, env) for a in list(args)]
        n_scaled = max(round(n * gd), 1) if n > 1 else n
        fi = f if isinstance(f, int) else list(f)
        # resolve relative indices other than -1 to absolute (reference builds
        # its save list with `x % i`, yolo.py:424 — same arithmetic)
        if isinstance(fi, int) and fi < -1:
            fi = i + fi
        elif isinstance(fi, list):
            fi = [i + j if j < -1 else j for j in fi]

        # ch is [input] + one entry per layer, so layer j's output channels
        # live at ch[j + 1] (the reference instead resets ch at i==0).
        def get_ch(j):
            return ch[-1] if j == -1 else ch[j + 1]

        def get_stride(j):
            return strides[-1] if j == -1 else strides[j + 1]

        c1: Union[int, List[int]]
        stride_out = get_stride(fi if isinstance(fi, int) else fi[0])

        if m in _CH_OUT_MODULES:
            c1 = get_ch(fi)
            c2 = args[0]
            if c2 != no:
                c2 = make_divisible(c2 * gw, 8)
            args = [c1, c2, *args[1:]]
            # square list kernels like [1, 1] (hub yolov3.yaml) -> int
            if len(args) > 2 and isinstance(args[2], list) and \
                    len(set(args[2])) == 1:
                args[2] = args[2][0]
            if m in _REPEAT_INSERT:
                args.insert(2, n_scaled)
                n_scaled = 1
            if m == "Focus":
                stride_out *= 2
            elif (len(args) > 3 and isinstance(args[3], int)
                  and not isinstance(args[3], bool) and args[3] > 1):
                # strided conv variants (args = [c1, c2, k, s, ...]; bool
                # args[3] is a shortcut flag on C3-family rows, not a stride)
                stride_out *= args[3]
        elif m == "nn.BatchNorm2d":
            c1 = get_ch(fi)
            c2 = c1
            args = [c1]
        elif m == "Concat":
            c1 = [get_ch(j) for j in fi]
            c2 = sum(c1)
        elif m == "Detect":
            c1 = [get_ch(j) for j in fi]
            if isinstance(args[1], int):
                # 'anchors: N' auto-anchor form (reference yolo.py:405-406):
                # placeholder N anchors per level, evolved by autoanchor
                args[1] = [list(range(args[1] * 2))] * len(fi)
                d["anchors"] = args[1]
            args.append(list(c1))
            c2 = no
            detect_index = i
            det_strides = [get_stride(j) for j in fi]
        elif m in _SEG_HEADS:
            args[1] = max(round(args[1] * gd), 1) if args[1] > 1 else args[1]
            args[2] = make_divisible(args[2] * gw, 8)
            c1 = [get_ch(j) for j in fi]
            args.append(list(c1))
            c2 = args[0]
            seg_index = i
            stride_out = 1  # upsampled to full resolution
        elif m == "Contract":
            c1 = get_ch(fi)
            c2 = c1 * args[0] ** 2
            stride_out *= args[0]
        elif m == "Expand":
            c1 = get_ch(fi)
            c2 = c1 // args[0] ** 2
            stride_out //= args[0]
        elif m == "nn.Upsample":
            c1 = get_ch(fi)
            c2 = c1
            scale = args[1]
            stride_out = stride_out // scale
        elif m == "nn.MaxPool2d":
            c1 = get_ch(fi)
            c2 = c1
            # torch default: stride = kernel_size (mirrors model.py runtime)
            s = args[1] if len(args) > 1 and args[1] else args[0]
            if s > 1:
                stride_out *= s
        elif m == "nn.ZeroPad2d":
            c1 = get_ch(fi)
            c2 = c1
        else:
            c1 = get_ch(fi)
            c2 = c1
        rows.append(Row(i, fi, n_scaled, m, args, c1, c2, stride_out))
        for j in ([fi] if isinstance(fi, int) else fi):
            if j != -1:
                save.add(j)
        ch.append(c2)
        strides.append(stride_out)

    if seg_index is not None:
        save.add(seg_index)  # reference Model.__init__ save.append(24)

    spec = ModelSpec(
        rows=rows, nc=nc_, n_segcls=n_segcls,
        anchors=d["anchors"] if isinstance(d["anchors"], list) else [],
        strides=det_strides, save=save,
        detect_index=detect_index, seg_index=seg_index,
        names=[str(j) for j in range(nc_)], yaml=d, ch_in=ch_in,
    )
    _check_anchor_order(spec)
    return spec


def _check_anchor_order(spec: ModelSpec) -> None:
    """reference utils/autoanchor.py:12-20 — anchor area must ascend with
    stride; reverse if not.  Exact reference semantics: compare the sign of
    (last anchor area − first anchor area) over the *flattened* anchor list
    against the stride delta (sign(0) counts as disagreeing with a positive
    stride delta, like torch's .sign())."""
    if not spec.anchors or not spec.strides:
        return
    flat = [a * b for lv in spec.anchors for a, b in zip(lv[::2], lv[1::2])]
    da = flat[-1] - flat[0]
    ds = spec.strides[-1] - spec.strides[0]
    sign = lambda v: (v > 0) - (v < 0)  # noqa: E731
    if sign(da) != sign(ds):
        flipped = list(spec.anchors[::-1])
        spec.anchors = flipped
        # the Detect row's args[1] feeds init_detect's anchor buffers
        # (model.py:83) — it must flip together with spec.anchors or decode
        # and loss end up pairing P3 predictions with P5 anchors
        if spec.detect_index is not None and spec.detect_index >= 0:
            spec.rows[spec.detect_index].args[1] = flipped


def load_spec(cfg: Union[str, Dict[str, Any]], ch: int = 3,
              nc: Optional[int] = None, anchors=None) -> ModelSpec:
    """Accepts a dict, a path to a reference-format yaml, or a built-in name
    from :mod:`multiyolov5_tpu.models.zoo` (e.g. 'yolov5s_city_seg')."""
    if isinstance(cfg, dict):
        return compile_spec(cfg, ch, nc, anchors)
    import os
    if os.path.exists(cfg):
        import yaml
        with open(cfg) as fh:
            return compile_spec(yaml.safe_load(fh), ch, nc, anchors)
    from . import zoo
    return compile_spec(zoo.get(cfg), ch, nc, anchors)
