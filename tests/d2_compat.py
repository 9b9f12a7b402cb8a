"""Import shims that let the vendored detectron2 fork (py-bottom-up-attention,
PUBLIC reference code at /root/reference) build its VG R-C4 model in this
environment, which lacks fvcore / torchvision / the compiled detectron2._C
extension.

Used ONLY by the composed-detector parity test: the stubs reimplement the
exact documented semantics of the handful of runtime functions the inference
path touches (torchvision nms / batched_nms / RoIPool, fvcore weight inits),
and satisfy import-time references for everything else.
"""
from __future__ import annotations

import math
import sys
import types

import torch

D2_ROOT = "/root/reference/features_extraction/py-bottom-up-attention"


# ---------------------------------------------------------------------------
# torchvision.ops: nms / batched_nms / RoIPool with torchvision's exact
# semantics (greedy score-descending suppression with IoU > thresh strictly;
# quantized max-pool RoIPool — same algorithm as our ops/roi.py legacy mode).
# ---------------------------------------------------------------------------

def tv_nms(boxes: torch.Tensor, scores: torch.Tensor,
           iou_threshold: float) -> torch.Tensor:
    order = scores.argsort(descending=True)
    boxes = boxes[order]
    x1, y1, x2, y2 = boxes.unbind(-1)
    areas = (x2 - x1) * (y2 - y1)
    keep = []
    alive = torch.ones(len(order), dtype=torch.bool)
    for i in range(len(order)):
        if not alive[i]:
            continue
        keep.append(order[i].item())
        xx1 = torch.maximum(x1[i], x1)
        yy1 = torch.maximum(y1[i], y1)
        xx2 = torch.minimum(x2[i], x2)
        yy2 = torch.minimum(y2[i], y2)
        inter = (xx2 - xx1).clamp(min=0) * (yy2 - yy1).clamp(min=0)
        iou = inter / (areas[i] + areas - inter)
        alive &= iou <= iou_threshold
        alive[i] = False
    return torch.as_tensor(keep, dtype=torch.int64)


def tv_batched_nms(boxes, scores, idxs, iou_threshold):
    if boxes.numel() == 0:
        return torch.empty((0,), dtype=torch.int64)
    max_coordinate = boxes.max()
    offsets = idxs.to(boxes) * (max_coordinate + 1)
    return tv_nms(boxes + offsets[:, None], scores, iou_threshold)


class TvRoIPool(torch.nn.Module):
    """torchvision.ops.RoIPool: integer-quantized bins, max pool
    (torchvision csrc/roi_pool semantics; cf. clg_vqa_tpu/ops/roi.py)."""

    def __init__(self, output_size, spatial_scale):
        super().__init__()
        self.output_size = (output_size if isinstance(output_size, tuple)
                            else (output_size, output_size))
        self.spatial_scale = spatial_scale

    def forward(self, input: torch.Tensor, rois: torch.Tensor):
        # rois: [K, 5] (batch_idx, x1, y1, x2, y2)
        ph, pw = self.output_size
        N, C, H, W = input.shape
        out = input.new_zeros((rois.shape[0], C, ph, pw))
        for k in range(rois.shape[0]):
            b = int(rois[k, 0])
            x1 = int(torch.round(rois[k, 1] * self.spatial_scale))
            y1 = int(torch.round(rois[k, 2] * self.spatial_scale))
            x2 = int(torch.round(rois[k, 3] * self.spatial_scale))
            y2 = int(torch.round(rois[k, 4] * self.spatial_scale))
            rw = max(x2 - x1 + 1, 1)
            rh = max(y2 - y1 + 1, 1)
            for i in range(ph):
                hs = min(max(y1 + int(math.floor(i * rh / ph)), 0), H)
                he = min(max(y1 + int(math.ceil((i + 1) * rh / ph)), 0), H)
                for j in range(pw):
                    ws = min(max(x1 + int(math.floor(j * rw / pw)), 0), W)
                    we = min(max(x1 + int(math.ceil((j + 1) * rw / pw)), 0), W)
                    if he > hs and we > ws:
                        out[k, :, i, j] = input[b, :, hs:he, ws:we] \
                            .amax(dim=(-2, -1))
        return out


# ---------------------------------------------------------------------------
# fvcore: CfgNode (yacs-alike), weight inits, losses
# ---------------------------------------------------------------------------

class CfgNode(dict):
    """Minimal yacs/fvcore CfgNode: attribute access, yaml merge, clone."""
    IS_FROZEN = "__frozen__"

    def __init__(self, init_dict=None):
        super().__init__()
        for k, v in (init_dict or {}).items():
            self[k] = CfgNode(v) if isinstance(v, dict) else v

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name, value):
        self[name] = value

    def clone(self):
        import copy
        return copy.deepcopy(self)

    def freeze(self):
        pass

    def defrost(self):
        pass

    def merge_from_other_cfg(self, other):
        def rec(dst, src):
            for k, v in src.items():
                if isinstance(v, dict) and isinstance(dst.get(k), dict):
                    rec(dst[k], v)
                else:
                    dst[k] = CfgNode(v) if isinstance(v, dict) else v
        rec(self, other)

    def merge_from_file(self, filename, allow_unsafe=False):
        import os
        import yaml
        with open(filename) as f:
            raw = yaml.unsafe_load(f)
        base = raw.pop("_BASE_", None)
        if base:
            self.merge_from_file(
                os.path.join(os.path.dirname(filename), base))
        self.merge_from_other_cfg(raw)

    def merge_from_list(self, opts):
        for k, v in zip(opts[0::2], opts[1::2]):
            node = self
            parts = k.split(".")
            for p in parts[:-1]:
                node = node[p]
            node[parts[-1]] = v

    # fvcore load_yaml_with_base API used by detectron2.config
    @staticmethod
    def load_yaml_with_base(filename, allow_unsafe=False):
        cfg = CfgNode()
        cfg.merge_from_file(filename, allow_unsafe)
        return dict(cfg)


def c2_msra_fill(module):
    torch.nn.init.kaiming_normal_(module.weight, mode="fan_out",
                                  nonlinearity="relu")
    if module.bias is not None:
        torch.nn.init.constant_(module.bias, 0)


def c2_xavier_fill(module):
    torch.nn.init.kaiming_uniform_(module.weight, a=1)
    if module.bias is not None:
        torch.nn.init.constant_(module.bias, 0)


def smooth_l1_loss(input, target, beta, reduction="none"):
    if beta < 1e-5:
        loss = torch.abs(input - target)
    else:
        n = torch.abs(input - target)
        loss = torch.where(n < beta, 0.5 * n ** 2 / beta, n - 0.5 * beta)
    if reduction == "mean":
        return loss.mean()
    if reduction == "sum":
        return loss.sum()
    return loss


class Transform:
    """fvcore.transforms.transform.Transform (mini): attribute capture +
    register_type; geometric methods come from subclasses."""

    def _set_attributes(self, params=None):
        if params:
            for k, v in params.items():
                if k != "self" and not k.startswith("_"):
                    setattr(self, k, v)

    @classmethod
    def register_type(cls, data_type, func=None):
        if func is None:
            return lambda f: f
        return func

    def apply_box(self, box):
        import numpy as np
        idxs = np.array([(0, 1), (2, 1), (0, 3), (2, 3)]).flatten()
        coords = np.asarray(box).reshape(-1, 4)[:, idxs].reshape(-1, 2)
        coords = self.apply_coords(coords).reshape((-1, 4, 2))
        minxy = coords.min(axis=1)
        maxxy = coords.max(axis=1)
        return np.concatenate((minxy, maxxy), axis=1)


class NoOpTransform(Transform):
    def apply_image(self, img):
        return img

    def apply_coords(self, coords):
        return coords


class HFlipTransform(Transform):
    def __init__(self, width):
        self._set_attributes(locals())

    def apply_image(self, img):
        return img[:, ::-1]

    def apply_coords(self, coords):
        coords[:, 0] = self.width - coords[:, 0]
        return coords


class TransformList(Transform):
    def __init__(self, transforms):
        self.transforms = transforms

    def apply_image(self, img):
        for t in self.transforms:
            img = t.apply_image(img)
        return img

    def apply_coords(self, coords):
        for t in self.transforms:
            coords = t.apply_coords(coords)
        return coords

    def __add__(self, other):
        others = other.transforms if isinstance(other, TransformList) \
            else [other]
        return TransformList(self.transforms + others)


class BlendTransform(Transform):
    def __init__(self, src_image, src_weight, dst_weight):
        self._set_attributes(locals())

    def apply_image(self, img):
        return (self.src_weight * self.src_image
                + self.dst_weight * img).astype(img.dtype)

    def apply_coords(self, coords):
        return coords


class CropTransform(Transform):
    def __init__(self, x0, y0, w, h):
        self._set_attributes(locals())

    def apply_image(self, img):
        return img[self.y0:self.y0 + self.h, self.x0:self.x0 + self.w]

    def apply_coords(self, coords):
        coords[:, 0] -= self.x0
        coords[:, 1] -= self.y0
        return coords


class Registry:
    """fvcore.common.registry.Registry: name -> class map with a register
    decorator (detectron2 builds models by registry lookup)."""

    def __init__(self, name):
        self._name = name
        self._map = {}

    def register(self, obj=None):
        if obj is None:
            def deco(cls):
                self._map[cls.__name__] = cls
                return cls
            return deco
        self._map[obj.__name__] = obj
        return obj

    def get(self, name):
        return self._map[name]


class _NullCtx:
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


class _PathManager:
    @staticmethod
    def get_local_path(path, **kw):
        return path

    @staticmethod
    def open(path, mode="r", **kw):
        return open(path, mode)

    @staticmethod
    def exists(path):
        import os
        return os.path.exists(path)

    @staticmethod
    def isfile(path):
        import os
        return os.path.isfile(path)


def _module(name, **attrs):
    import importlib.machinery
    m = types.ModuleType(name)
    # A real ModuleSpec, or later importlib.util.find_spec(name) raises
    # "ValueError: __spec__ is None" (e.g. transformers probing torchvision)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def install() -> None:
    """Install all shims and put the vendored detectron2 on sys.path."""
    if D2_ROOT not in sys.path:
        sys.path.insert(0, D2_ROOT)

    # Pillow >= 10 removed the legacy resample aliases detectron2 uses
    from PIL import Image
    for legacy, modern in (("LINEAR", "BILINEAR"), ("CUBIC", "BICUBIC"),
                           ("NEAREST", "NEAREST")):
        if not hasattr(Image, legacy):
            setattr(Image, legacy, getattr(Image.Resampling, modern))

    # torchvision
    if "torchvision" not in sys.modules:
        tv = _module("torchvision")
        boxes_mod = _module("torchvision.ops.boxes", nms=tv_nms,
                            batched_nms=tv_batched_nms)
        ops = _module("torchvision.ops", nms=tv_nms, boxes=boxes_mod,
                      RoIPool=TvRoIPool, batched_nms=tv_batched_nms)
        tv.ops = ops

    # fvcore
    if "fvcore" not in sys.modules:
        fv = _module("fvcore")
        common = _module("fvcore.common")
        _module("fvcore.common.config", CfgNode=CfgNode)
        _module("fvcore.common.file_io", PathManager=_PathManager,
                PathHandler=object, file_lock=lambda p: _NullCtx())
        _module("fvcore.common.checkpoint", Checkpointer=object,
                PeriodicCheckpointer=object)
        _module("fvcore.common.timer", Timer=object)
        _module("fvcore.common.history_buffer", HistoryBuffer=object)
        _module("fvcore.common.registry", Registry=Registry)
        nn_mod = _module("fvcore.nn", smooth_l1_loss=smooth_l1_loss,
                         sigmoid_focal_loss_jit=None,
                         sigmoid_focal_loss_star_jit=None,
                         giou_loss=None)
        wi = _module("fvcore.nn.weight_init", c2_msra_fill=c2_msra_fill,
                     c2_xavier_fill=c2_xavier_fill)
        nn_mod.weight_init = wi
        transforms_pkg = _module("fvcore.transforms")
        tmod = _module("fvcore.transforms.transform",
                       Transform=Transform, TransformList=TransformList,
                       NoOpTransform=NoOpTransform,
                       HFlipTransform=HFlipTransform,
                       BlendTransform=BlendTransform,
                       CropTransform=CropTransform,
                       VFlipTransform=NoOpTransform,
                       ScaleTransform=NoOpTransform,
                       GridSampleTransform=NoOpTransform)
        transforms_pkg.transform = tmod
        fv.common = common
        fv.nn = nn_mod
        fv.transforms = transforms_pkg

    # imagesize (dataset loading helper, import-time only on our path)
    if "imagesize" not in sys.modules:
        _module("imagesize", get=lambda p: (0, 0))

    # pycocotools (mask RLE, off-path for VG detection): import-time only
    if "pycocotools" not in sys.modules:
        pc = _module("pycocotools")
        pc.mask = _module("pycocotools.mask",
                          frPyObjects=None, decode=None, merge=None)

    # detectron2._C (compiled kernels): inference path for the VG R-C4 model
    # never calls it (ROIPool comes from torchvision, NMS from torchvision),
    # but several layers modules import it at module scope.
    if "detectron2._C" not in sys.modules:
        _module("detectron2._C")
