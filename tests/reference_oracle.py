"""Import helpers for using the PyTorch reference as a golden test oracle.

The reference at /root/reference is CPU-runnable for the matcher, criterion,
ViT backbone and decoder layers once its unavailable imports are stubbed:
``torchvision`` (imported but unused at module scope), ``timm`` (only
``trunc_normal_``/``drop_path``/``to_2tuple``/``DropPath``/``register_model``
are used), the CUDA extension ``MultiScaleDeformableAttention`` and the
external ``VideoMamba`` package (only reached for ssm encoder types).

This module is TEST-ONLY tooling: the framework itself never imports the
reference.
"""

from __future__ import annotations

import sys
import types

REFERENCE_ROOT = "/root/reference"


def _stub_module(name: str) -> types.ModuleType:
    mod = types.ModuleType(name)
    sys.modules[name] = mod
    return mod


def install_reference(need_model_stubs: bool = False):
    """Make /root/reference importable; returns after sys.path/stub setup."""
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    import numpy as np
    import torch

    # numpy 2.x compat for the reference's numpy-1.x spellings
    if not hasattr(np, "float_"):
        np.float_ = np.float64
    if not hasattr(np, "NAN"):
        np.NAN = np.nan
    if not hasattr(np, "bool"):
        np.bool = bool

    if "torchvision" not in sys.modules:
        tv = _stub_module("torchvision")
        tv.__version__ = "0.15"
        tv.__path__ = []  # mark as package so submodule stubs resolve
        ops_mod = _stub_module("torchvision.ops")
        boxes_mod = _stub_module("torchvision.ops.boxes")

        def box_area(boxes):
            return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])

        boxes_mod.box_area = box_area
        ops_mod.boxes = boxes_mod
        tv.ops = ops_mod
        models_mod = _stub_module("torchvision.models")
        models_mod.__path__ = []
        video_mod = _stub_module("torchvision.models.video")
        video_resnet_mod = _stub_module("torchvision.models.video.resnet")
        video_resnet_mod.VideoResNet = type(
            "VideoResNet", (torch.nn.Module,), {}
        )
        video_mod.resnet = video_resnet_mod
        models_mod.video = video_mod
        # functional transforms used by datasets/video_transforms.py — real
        # implementations so dataset parity tests can run the reference
        transforms_mod = _stub_module("torchvision.transforms")
        func_mod = _stub_module("torchvision.transforms.functional")
        import random as _random

        import numpy as _np
        from PIL import Image as _PILImage

        def t_crop(img, top, left, height, width):
            return img.crop((left, top, left + width, top + height))

        def t_hflip(img):
            return img.transpose(_PILImage.FLIP_LEFT_RIGHT)

        def t_resize(img, size):
            if isinstance(size, int):
                w, h = img.size
                if w < h:
                    size = (int(size * h / w), size)
                else:
                    size = (size, int(size * w / h))
            return img.resize(size[::-1], _PILImage.BILINEAR)

        def t_to_tensor(img):
            arr = _np.asarray(img)
            if arr.dtype == _np.uint8:
                arr = arr.astype(_np.float32) / 255.0
            return torch.from_numpy(arr.transpose(2, 0, 1).copy())

        def t_normalize(tensor, mean, std):
            mean = torch.as_tensor(mean, dtype=tensor.dtype).view(-1, 1, 1)
            std = torch.as_tensor(std, dtype=tensor.dtype).view(-1, 1, 1)
            return (tensor - mean) / std

        func_mod.crop = t_crop
        func_mod.hflip = t_hflip
        func_mod.resize = t_resize
        func_mod.to_tensor = t_to_tensor
        func_mod.normalize = t_normalize
        func_mod.pad = lambda img, padding: img

        class _RandomCrop:
            @staticmethod
            def get_params(img, output_size):
                h, w = output_size
                top = _random.randint(0, img.height - h)
                left = _random.randint(0, img.width - w)
                return top, left, h, w

        transforms_mod.RandomCrop = _RandomCrop
        transforms_mod.RandomErasing = type("RandomErasing", (), {})
        transforms_mod.functional = func_mod
        tv.transforms = transforms_mod

        utils_mod = _stub_module("torchvision.models._utils")

        class IntermediateLayerGetter(torch.nn.ModuleDict):
            """Functional port of torchvision's IntermediateLayerGetter:
            run children in registration order, collect requested outputs."""

            def __init__(self, model, return_layers):
                orig_return_layers = dict(return_layers)
                layers = {}
                remaining = dict(return_layers)
                for name, module in model.named_children():
                    layers[name] = module
                    if name in remaining:
                        del remaining[name]
                    if not remaining:
                        break
                super().__init__(layers)
                self.return_layers = orig_return_layers

            def forward(self, x):
                out = {}
                for name, module in self.items():
                    x = module(x)
                    if name in self.return_layers:
                        out[self.return_layers[name]] = x
                return out

        utils_mod.IntermediateLayerGetter = IntermediateLayerGetter
        models_mod._utils = utils_mod
        tv.models = models_mod

    if "timm" not in sys.modules:
        timm = _stub_module("timm")
        timm_models = _stub_module("timm.models")
        registry = _stub_module("timm.models.registry")
        layers = _stub_module("timm.models.layers")

        def register_model(fn=None, *a, **k):
            return fn if fn is not None else (lambda f: f)

        def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
            with torch.no_grad():
                tensor.normal_(mean, std).clamp_(a, b)
            return tensor

        def drop_path(x, drop_prob=0.0, training=False, scale_by_keep=True):
            if drop_prob == 0.0 or not training:
                return x
            keep = 1 - drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = x.new_empty(shape).bernoulli_(keep)
            return x * mask / keep

        class DropPath(torch.nn.Module):
            def __init__(self, drop_prob=0.0):
                super().__init__()
                self.drop_prob = drop_prob

            def forward(self, x):
                return drop_path(x, self.drop_prob, self.training)

        def to_2tuple(x):
            return x if isinstance(x, tuple) else (x, x)

        timm.create_model = lambda *a, **k: None
        timm_models.create_model = timm.create_model
        registry.register_model = register_model
        layers.trunc_normal_ = trunc_normal_
        layers.drop_path = drop_path
        layers.DropPath = DropPath
        layers.to_2tuple = to_2tuple
        timm.models = timm_models
        timm_models.registry = registry
        timm_models.layers = layers
        sys.modules["timm.models.layers"] = layers
        sys.modules["timm.models.registry"] = registry

    if need_model_stubs:
        if "MultiScaleDeformableAttention" not in sys.modules:
            msda = _stub_module("MultiScaleDeformableAttention")

            def _unavailable(*a, **k):
                raise RuntimeError("CUDA extension not available in oracle mode")

            msda.ms_deform_attn_forward = _unavailable
            msda.ms_deform_attn_backward = _unavailable

        if "VideoMamba" not in sys.modules:
            for name in (
                "VideoMamba", "VideoMamba.mamba", "VideoMamba.mamba.mamba_ssm",
                "VideoMamba.mamba.mamba_ssm.modules",
                "VideoMamba.videomamba", "VideoMamba.videomamba.video_sm",
                "VideoMamba.videomamba.video_sm.models",
            ):
                _stub_module(name).__path__ = []
            simple = _stub_module("VideoMamba.mamba.mamba_ssm.modules.mamba_simple")

            class Mamba(torch.nn.Module):
                def __init__(self, *a, **k):
                    super().__init__()

            simple.Mamba = Mamba

            vm = _stub_module("VideoMamba.videomamba.video_sm.models.videomamba")
            vm.videomamba_tiny = lambda *a, **k: None
            vm.videomamba_small = lambda *a, **k: None
            vm.videomamba_middle = lambda *a, **k: None

        # common_utils_mbyolo unconditionally imports selective_scan_cuda in
        # its fallback branch — stub both extension modules.
        for name in ("selective_scan_cuda_core", "selective_scan_cuda"):
            if name not in sys.modules:
                mod = _stub_module(name)

                def _no_cuda(*a, **k):
                    raise RuntimeError("CUDA extension not available")

                mod.fwd = _no_cuda
                mod.bwd = _no_cuda
