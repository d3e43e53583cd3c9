"""Model assembly: YAML graph spec -> flax module + metadata.

Rebuild of the reference's ``ultralytics/nn/tasks.py`` (``parse_model:780``,
``DetectionModel:275``, ``yaml_model_load:1065``, ``guess_model_scale:1083``)
as a small graph compiler:

- ``parse_model`` turns the YAML rows [from, repeats, module, args] into a
  tuple of flax module instances plus savelist routing metadata;
- ``GraphModel`` is one flax module that executes the graph — traced once
  under jit into a single XLA program (the reference's ``_predict_once``
  sequential walk, but functional);
- ``DetectionModel`` wraps the graph with params init, stride calibration
  (via ``jax.eval_shape`` — zero-FLOP version of the reference's dry run at
  ``tasks.py:303-330``) and Detect bias priors (``head.py:bias_init``).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax.core import freeze, unfreeze

from experiment_yolo_tpu.nn import extra_modules as X
from experiment_yolo_tpu.nn import modules as M
from experiment_yolo_tpu.utils import LOGGER, ROOT, yaml_load

# ---------------------------------------------------------------------------
# registry: YAML module name -> (builder, kind)
# kind controls channel arithmetic, mirroring the big if/elif chain in the
# reference's parse_model (tasks.py:826-1040).
# ---------------------------------------------------------------------------


def make_divisible(x: float, divisor: int = 8) -> int:
    return int(math.ceil(x / divisor) * divisor)


def _whole_backbones():
    """Lazy import of the whole-backbone name registry (backbones.py)."""
    from experiment_yolo_tpu.nn.backbones import WHOLE_BACKBONES

    return WHOLE_BACKBONES


def _zoo_inner(mname: str) -> str | None:
    """'C2f_<X>'/'C3_<X>' -> '<X>' when X is a registered zoo inner block."""
    from experiment_yolo_tpu.nn.zoo_blocks import INNER_BLOCKS

    suffix = mname.split("_", 1)[1] if "_" in mname else ""
    return suffix if suffix in INNER_BLOCKS else None


# channel-preserving attention registry (reference tasks.py:962-971 branch)
_ATTENTION = {
    "EMA": X.EMAAttention,
    "SimAM": X.SimAM,
    "CoordAtt": X.CoordAtt,
    "TripletAttention": X.TripletAttention,
    "SEAttention": X.SEAttention,
    "EffectiveSEModule": X.EffectiveSE,
    "CBAM": X.CBAM,
    "ChannelAttention": X.ChannelAttention,
    "SpatialAttention": X.SpatialAttention,
    "ELA": X.ELA,
    "CAA": X.CAA,
    "LSKBlock": X.LSKBlock,
    "SpatialGroupEnhance": X.SpatialGroupEnhance,
    "BAMBlock": X.BAMBlock,
    "CPCA": X.CPCA,
    "MPCA": X.MPCA,
    "LSKA": X.LSKA,
    "SegNext_Attention": X.SegNextAttention,
    "MLCA": X.MLCA,
    "LocalWindowAttention": X.LocalWindowAttention,
    "EfficientAttention": X.EfficientAttention,
    "deformable_LKA": X.DeformableLKA,
    "DAttention": X.DAttention,
    "FocusedLinearAttention": X.FocusedLinearAttention,
    "TransNeXt_AggregatedAttention": "TN_AGG",
    "BiLevelRoutingAttention": X.BiLevelRoutingAttention,
    "BiLevelRoutingAttention_nchw": "BRA_NCHW",
}

# HS-FPN gates (reference tasks.py:966: channel-preserving, args prepended)
def _hsfpn_registry():
    from experiment_yolo_tpu.nn import zoo_blocks as Z

    return {
        "ChannelAttention_HSFPN": Z.ChannelAttentionHSFPN,
        "ELA_HSFPN": Z.ELAHSFPN,
        "CA_HSFPN": Z.CAHSFPN,
        "CAA_HSFPN": Z.CAAHSFPN,
    }


@dataclass
class LayerSpec:
    module: Any  # flax module instance
    f: Tuple[int, ...]  # absolute source indices; -1 = previous layer
    i: int
    type: str
    c2: int
    is_list_input: bool


def _scale_ch(c2: int, nc: int, width: float, max_channels: float) -> int:
    if c2 == nc:
        return c2
    return make_divisible(min(c2, max_channels) * width, 8)


def parse_model(d: dict, ch: int = 3, scale: Optional[str] = None, dtype=jnp.float32, verbose: bool = False,
                out_extras: Optional[dict] = None):
    """Compile a model-YAML dict into layer specs.

    Returns (layers: List[LayerSpec], save: sorted list of indices whose
    outputs later layers consume, detect_index, nc, reg_max).
    """
    nc = d.get("nc", 80)
    scales = d.get("scales")
    depth, width, max_channels = 1.0, 1.0, float("inf")
    if scales:
        scale = scale or d.get("scale") or tuple(scales.keys())[0]
        depth, width, max_channels = scales[scale]

    chs: List[int] = [ch]
    layers: List[LayerSpec] = []
    save: set = set()
    detect_idx = -1
    reg_max = 16

    rows = list(d["backbone"]) + list(d["head"])
    for i, (f, n, mname, args) in enumerate(rows):
        # YAML 'None'/'True'/'False' strings -> Python values (the reference
        # runs ast.literal_eval over string args, tasks.py:816-821)
        args = [
            {"None": None, "True": True, "False": False}.get(a, a) if isinstance(a, str) else a
            for a in args
        ]
        f_list = f if isinstance(f, list) else [f]
        n = max(round(n * depth), 1) if n > 1 else n

        def src_ch(j):
            return chs[j] if j != -1 else chs[-1]

        c1 = src_ch(f_list[0])
        list_input = len(f_list) > 1
        mod = None

        if mname in ("Conv", "LDConv", "DWConv", "Focus", "GhostConv", "SPDConv"):
            c2 = _scale_ch(args[0], nc, width, max_channels)
            if mname == "Conv":
                mod = M.ConvBN(c2, *args[1:], dtype=dtype)
            elif mname == "LDConv":
                # YAML args: [outc, num_param, stride] (reference conv.py:350)
                mod = M.LDConv(c2, *args[1:], dtype=dtype)
            elif mname == "DWConv":
                mod = M.DWConv(c2, *args[1:], dtype=dtype)
            elif mname == "Focus":
                mod = M.Focus(c2, *args[1:], dtype=dtype)
            elif mname == "GhostConv":
                mod = M.GhostConv(c2, *args[1:], dtype=dtype)
            else:
                mod = M.SPDConv(c2, dtype=dtype)
        elif mname == "MBConv":
            # YAML args: [outc, expand, act, drop_path, stride]; repeats fold
            # inside the module (reference tasks.py:849-863)
            c2 = _scale_ch(args[0], nc, width, max_channels)
            e = args[1] if len(args) > 1 else 6
            act = args[2] if len(args) > 2 else "SiLU"
            drop = args[3] if len(args) > 3 else 0.0
            stride = args[4] if len(args) > 4 else 1
            mod = M.MBConv(c2, n=n, e=e, act=str(act).lower(), drop_path=drop, stride=stride, dtype=dtype)
            n = 1
        elif mname in ("C2f", "C3", "C2f_LDConv", "SC2f", "ESC2f"):
            c2 = _scale_ch(args[0], nc, width, max_channels)
            shortcut = args[1] if len(args) > 1 else (mname == "C3")
            cls = {"C2f": M.C2f, "C3": M.C3, "C2f_LDConv": M.C2fLD, "SC2f": X.SC2f, "ESC2f": X.ESC2f}[mname]
            mod = cls(c2, n=n, shortcut=shortcut, dtype=dtype)
            n = 1
        elif mname == "Bottleneck":
            c2 = _scale_ch(args[0], nc, width, max_channels)
            mod = M.Bottleneck(c2, *args[1:], dtype=dtype)
        elif (mname.startswith("C2f_") or mname.startswith("C3_")) and _zoo_inner(mname):
            # C2f_<X>/C3_<X> zoo family (reference extra_modules/block.py):
            # generic CSP containers + the INNER_BLOCKS registry
            from experiment_yolo_tpu.nn import zoo_blocks as Z

            c2 = _scale_ch(args[0], nc, width, max_channels)
            inner = _zoo_inner(mname)
            extra = None
            rest = list(args[1:])
            if inner == "AggregatedAtt" and len(rest) >= 2:
                # (c1, c2, n, input_resolution, sr_ratio, ...) block.py:3609
                extra = (rest.pop(0), rest.pop(0))
            elif inner in ("SWC", "iRMB_DRB", "iRMB_SWC", "UniRepLKNetBlock",
                           "DAttention", "FocusedLinearAttention", "Parc") and rest:
                # reference signature (c1, c2, n, kernel_size, shortcut, ...)
                extra = rest.pop(0)
            shortcut = bool(rest[0]) if rest else False
            cls = Z.C2fX if mname.startswith("C2f_") else Z.C3X
            mod = cls(c2, inner=inner, n=n, shortcut=shortcut, extra=extra, dtype=dtype)
            n = 1
        elif mname in ("RFAConv", "RFCBAMConv", "RFCAConv"):
            from experiment_yolo_tpu.nn import zoo_blocks as Z

            c2 = _scale_ch(args[0], nc, width, max_channels)
            cls = {"RFAConv": Z.RFAConv, "RFCBAMConv": Z.RFCBAMConv, "RFCAConv": Z.RFCAConv}[mname]
            mod = cls(c2, k=args[1] if len(args) > 1 else 3, dtype=dtype)
        elif mname == "AKConv":
            # the reference's AKConv (block.py:2986) is LDConv under another
            # name — identical sampling math (see nn/modules.py:LDConv)
            c2 = _scale_ch(args[0], nc, width, max_channels)
            mod = M.LDConv(c2, *args[1:], dtype=dtype)
        elif mname in ("GSConv", "GSConvns"):
            from experiment_yolo_tpu.nn import zoo_blocks as Z

            c2 = _scale_ch(args[0], nc, width, max_channels)
            k = args[1] if len(args) > 1 else 1
            s = args[2] if len(args) > 2 else 1
            if mname == "GSConv":
                mod = Z.GSConv(c2, k=k, s=s, dtype=dtype)
            else:
                mod = Z.GSConvNS(c2, k=k, s=s, dtype=dtype)
        elif mname in ("VoVGSCSP", "VoVGSCSPns", "VoVGSCSPC"):
            from experiment_yolo_tpu.nn import zoo_blocks as Z

            c2 = _scale_ch(args[0], nc, width, max_channels)
            mod = Z.VoVGSCSP(c2, n=n, ns=mname.endswith("ns"), cheap=mname.endswith("C"), dtype=dtype)
            n = 1
        elif mname == "SCConv":
            # SCNet self-calibrated conv, scaled-c2 registry set (tasks.py:828)
            from experiment_yolo_tpu.nn import zoo_blocks as Z

            c2 = _scale_ch(args[0], nc, width, max_channels)
            mod = Z.SCConvSC(c2, dtype=dtype)
        elif mname in ("EMSConv", "EMSConvP", "ScConv", "Partial_conv3", "DWR"):
            # attention-style registry entries: channel-preserving, c2 = c1
            # (reference tasks.py:961-963)
            from experiment_yolo_tpu.nn import zoo_blocks as Z

            c2 = c1
            if mname == "EMSConv":
                mod = Z.EMSConv(c2, dtype=dtype)
            elif mname == "EMSConvP":
                mod = Z.EMSConvP(c2, dtype=dtype)
            elif mname == "ScConv":
                mod = Z.ScConvCVPR23(c2, dtype=dtype)
            elif mname == "DWR":
                mod = Z.DWR(c2, dtype=dtype)
            else:
                mod = Z.PartialConv3(dtype=dtype)
        elif mname in ("ChannelAttention_HSFPN", "ELA_HSFPN", "CA_HSFPN", "CAA_HSFPN"):
            c2 = c1
            mod = _hsfpn_registry()[mname](*args, dtype=dtype)
        elif mname == "Multiply":
            from experiment_yolo_tpu.nn import zoo_blocks as Z

            c2 = src_ch(f_list[0])
            mod = Z.Multiply()
            list_input = True
        elif mname == "SDI":
            # args [[ch...]]; output channels = first input's (tasks.py:1012)
            from experiment_yolo_tpu.nn import zoo_blocks as Z

            inc = tuple(src_ch(j) for j in f_list)
            c2 = inc[0]
            mod = Z.SDI(c2, inc=inc, dtype=dtype)
            list_input = True
        elif mname in ("DCNV3_YOLO", "DCNV4_YOLO", "DCNv2"):
            from experiment_yolo_tpu.nn import zoo_blocks as Z

            c2 = _scale_ch(args[0], nc, width, max_channels)
            k = args[1] if len(args) > 1 else (1 if mname.startswith("DCNV") else 3)
            s_ = args[2] if len(args) > 2 else 1
            if mname == "DCNv2":
                mod = Z.DCNv2Conv(c2, k=k, s=s_, dtype=dtype)
            else:
                mod = Z.DCNV3YOLO(c2, k=k, version=3 if "V3" in mname else 4, dtype=dtype)
        elif mname == "HWD":
            from experiment_yolo_tpu.nn import zoo_blocks as Z

            c2 = _scale_ch(args[0], nc, width, max_channels)
            mod = Z.HWD(c2, dtype=dtype)
        elif mname == "ContextGuidedBlock_Down":
            from experiment_yolo_tpu.nn import zoo_blocks as Z

            c2 = c1 * 2
            mod = Z.ContextGuidedDown(c2, dtype=dtype)
        elif mname in ("LAWDS", "FocalModulation", "CAFM"):
            from experiment_yolo_tpu.nn import zoo_blocks as Z

            c2 = c1
            if mname == "LAWDS":
                mod = Z.LAWDS(c1, group=args[0] if args else 16, dtype=dtype)
            elif mname == "FocalModulation":
                mod = Z.FocalModulation(dtype=dtype)
            else:
                mod = Z.CAFM(dtype=dtype)
        elif mname in ("RCSOSA", "CSP_EDLAN", "RGCSPELAN", "SRFD", "DRFD", "CFC_CRB", "PPA"):
            from experiment_yolo_tpu.nn import zoo_blocks as Z

            if mname == "CFC_CRB":
                c2 = c1 // 2
                mod = Z.CFC_CRB(dtype=dtype)
            else:
                c2 = _scale_ch(args[0], nc, width, max_channels) if args else c1
                if mname == "RCSOSA":
                    mod = Z.RCSOSA(c2, n=n, se=bool(args[1]) if len(args) > 1 else False, dtype=dtype)
                    n = 1
                elif mname == "CSP_EDLAN":
                    mod = Z.CSPEDLAN(c2, n=n, dtype=dtype)
                    n = 1
                elif mname == "RGCSPELAN":
                    mod = Z.RGCSPELAN(c2, n=n, scale=args[1] if len(args) > 1 else 0.5, dtype=dtype)
                    n = 1
                elif mname == "SRFD":
                    mod = Z.SRFD(c2, dtype=dtype)
                elif mname == "DRFD":
                    mod = Z.DRFD(c2, dtype=dtype)
                else:
                    mod = Z.PPA(c2, dtype=dtype)
        elif mname in ("FocusFeature", "CSMHSA", "SFC_G2", "CGAFusion", "CAFMFusion", "DASI"):
            # multi-input fusion modules (reference tasks.py:1016-1037)
            from experiment_yolo_tpu.nn import zoo_blocks as Z

            inc = tuple(src_ch(j) for j in f_list)
            if mname == "FocusFeature":
                c2 = int(inc[1] * 0.5 * 3)
                mod = Z.FocusFeature(inc, dtype=dtype)
            elif mname == "CSMHSA":
                c2 = inc[-1]
                mod = Z.CSMHSA(dtype=dtype)
            elif mname == "SFC_G2":
                c2 = inc[0]
                mod = Z.SFC_G2(inc, dtype=dtype)
            elif mname in ("CGAFusion", "CAFMFusion"):
                c2 = inc[1]
                if mname == "CGAFusion":
                    mod = Z.CGAFusion(dtype=dtype)
                else:
                    mod = Z.CAFMFusion(heads=args[0] if args else 8, dtype=dtype)
            else:
                c2 = _scale_ch(args[0], nc, width, max_channels)
                mod = Z.DASI(c2, inc=inc, dtype=dtype)
        elif mname in ("KWConv", "C2f_KW", "C3_KW"):
            # Kernel Warehouse (kernel_warehouse.py; YAML keys
            # Warehouse_Manager / Warehouse_Manager_Ratio, reference
            # tasks.py:283-301): convs drawn from shared cell warehouses
            from experiment_yolo_tpu.nn import kernel_warehouse as KW

            if out_extras is not None and out_extras.get("kw_manager") is None:
                out_extras["kw_manager"] = KW.KWManager(
                    cell_num_ratio=float(d.get("Warehouse_Manager_Ratio", 1.0)))
            kw_manager = out_extras["kw_manager"] if out_extras is not None else KW.KWManager()
            c2 = _scale_ch(args[0], nc, width, max_channels)
            wm_name = str(args[1]) if len(args) > 1 else f"kw{i}"
            if mname == "KWConv":
                kk = int(args[2]) if len(args) > 2 else 1
                st = int(args[3]) if len(args) > 3 else 1
                plan = kw_manager.reserve(c1, c2, kk, 1, wm_name)
                mod = KW.KWConvModule(plan, stride=st, dtype=dtype)
            else:
                shortcut = bool(args[2]) if len(args) > 2 else False
                cc = c2 // 2
                k0 = 3 if mname == "C2f_KW" else 1
                plans = tuple(
                    (kw_manager.reserve(cc, cc, k0, 1, f"{wm_name}_cv1"),
                     kw_manager.reserve(cc, cc, 3, 1, f"{wm_name}_cv2"))
                    for _ in range(n))
                cls = KW.C2fKW if mname == "C2f_KW" else KW.C3KW
                mod = cls(c2, plans=plans, shortcut=shortcut, dtype=dtype)
                n = 1
        elif mname in ("OREPA", "OREPA_LargeConv", "RepVGGBlock_OREPA"):
            from experiment_yolo_tpu.nn import zoo_blocks as Z

            c2 = _scale_ch(args[0], nc, width, max_channels)
            if mname == "OREPA":
                mod = Z.OREPA(c2, k=args[1] if len(args) > 1 else 3,
                              s=args[2] if len(args) > 2 else 1, dtype=dtype)
            elif mname == "OREPA_LargeConv":
                mod = Z.OREPALargeConv(c2, k=args[1] if len(args) > 1 else 5,
                                       s=args[2] if len(args) > 2 else 1, dtype=dtype)
            else:
                mod = Z.RepVGGBlockOREPA(c2, s=args[2] if len(args) > 2 else 1, dtype=dtype)
        elif mname in ("C1", "C2"):
            from experiment_yolo_tpu.nn import zoo_blocks as Z

            c2 = _scale_ch(args[0], nc, width, max_channels)
            if mname == "C1":
                mod = Z.C1(c2, n=n, dtype=dtype)
            else:
                mod = Z.C2(c2, n=n, shortcut=bool(args[1]) if len(args) > 1 else True, dtype=dtype)
            n = 1
        elif mname == "DWConvTranspose2d":
            # depthwise transpose conv (modules/conv.py:124)
            c2 = _scale_ch(args[0], nc, width, max_channels)
            import math as _m

            k = args[1] if len(args) > 1 else 1
            st = args[2] if len(args) > 2 else 1
            mod = X.ConvTranspose(c2, k=k, s=st, bn=False, act=False,
                                  groups=_m.gcd(c1, c2), dtype=dtype)
        elif mname == "SEAM":
            from experiment_yolo_tpu.nn import zoo_blocks as Z

            c2 = c1  # the reference coerces c2 = c1 (block.py:3974)
            mod = Z.SEAM(c1, n=args[1] if len(args) > 1 else 1,
                         reduction=args[2] if len(args) > 2 else 16, dtype=dtype)
        elif mname == "DySnakeConv":
            from experiment_yolo_tpu.nn import zoo_blocks as Z

            cc = _scale_ch(args[0], nc, width, max_channels)
            c2 = cc * 3  # concat of three branches (reference tasks.py:868)
            mod = Z.DySnakeConv(cc, k=args[1] if len(args) > 1 else 3, dtype=dtype)
        elif mname == "Bottleneck_LDConv":
            from experiment_yolo_tpu.nn import zoo_blocks as Z

            c2 = _scale_ch(args[0], nc, width, max_channels)
            sc = bool(args[1]) if len(args) > 1 else True
            kk = tuple(args[3]) if len(args) > 3 else (1, 1)
            mod = Z._LDBottleneck(c2, k=kk, shortcut=sc, dtype=dtype)
        elif mname == "SPPF_LSKA":
            from experiment_yolo_tpu.nn import zoo_blocks as Z

            c2 = _scale_ch(args[0], nc, width, max_channels)
            mod = Z.SPPFLSKA(c2, k=args[1] if len(args) > 1 else 5, dtype=dtype)
        elif mname == "C3TR":
            from experiment_yolo_tpu.nn import zoo_blocks as Z

            c2 = _scale_ch(args[0], nc, width, max_channels)
            mod = Z.C3TR(c2, n=n, dtype=dtype)
            n = 1
        elif mname == "DGCST":
            from experiment_yolo_tpu.nn import zoo_blocks as Z

            c2 = _scale_ch(args[0], nc, width, max_channels)
            mod = Z.DGCST(c2, dtype=dtype)
        elif mname in ("SPPF", "SPP"):
            c2 = _scale_ch(args[0], nc, width, max_channels)
            cls = M.SPPF if mname == "SPPF" else M.SPP
            mod = cls(c2, *args[1:], dtype=dtype)
        elif mname == "nn.Upsample":
            # args (None, scale, mode)
            c2 = c1
            mod = M.Upsample(scale=int(args[1]), mode=args[2] if len(args) > 2 else "nearest")
        elif mname == "Concat":
            c2 = sum(src_ch(j) for j in f_list)
            mod = M.Concat()
        elif mname == "Silence":
            c2 = c1
            mod = M.Silence()
        elif mname == "Zoom_cat":
            c2 = sum(src_ch(j) for j in f_list)
            mod = M.ZoomCat()
        elif mname == "Add":
            c2 = src_ch(f_list[-1])
            mod = M.Add()
        elif mname in ("ScalSeq", "DynamicScalSeq"):
            # reference tasks.py:1005: c2 = make_divisible(args[0]*width, 8)
            inc = tuple(src_ch(j) for j in f_list)
            c2 = make_divisible(args[0] * width, 8)
            cls = M.ScalSeq if mname == "ScalSeq" else X.DynamicScalSeq
            mod = cls(c2, inc=inc, dtype=dtype)
        elif mname == "asf_attention_model":
            c2 = src_ch(f_list[-1])
            mod = M.AsfAttention(dtype=dtype)
        elif mname in _ATTENTION:  # channel-preserving attention (reference tasks.py:962-971)
            c2 = c1
            if mname == "MLCA":  # ECA kernel size derives from the channels
                mod = _ATTENTION[mname](c1, *args, dtype=dtype)
            elif mname in ("DAttention", "FocusedLinearAttention"):
                # reference signature (channel, fmapsize); channels inferred here
                fs = tuple(args[0]) if args else (20, 20)
                mod = _ATTENTION[mname](fs, dtype=dtype)
            elif mname == "BiLevelRoutingAttention_nchw":
                mod = X.BiLevelRoutingAttention(nchw=True, dtype=dtype)
            elif mname == "BiLevelRoutingAttention":
                mod = X.BiLevelRoutingAttention(dtype=dtype)
            elif mname == "TransNeXt_AggregatedAttention":
                # (dim, input_resolution, sr_ratio) attention.py:1530
                from experiment_yolo_tpu.nn.backbones import _TNAggregatedAttention

                sr = int(args[1]) if len(args) > 1 else 2
                mod = _TNAggregatedAttention(c1, 8, sr, dtype=dtype)
            elif mname == "SimAM":
                mod = _ATTENTION[mname](*args)
            else:
                mod = _ATTENTION[mname](*args, dtype=dtype)
        elif mname in ("Conv2", "DSConv", "LightConv", "RepConv", "ConvTranspose", "GhostBottleneck"):
            # NB: RFAConv routes to the zoo implementation above
            c2 = _scale_ch(args[0], nc, width, max_channels)
            cls = {
                "Conv2": X.Conv2Mod, "DSConv": X.DSConv, "LightConv": X.LightConv,
                "RepConv": X.RepConv, "ConvTranspose": X.ConvTranspose,
                "GhostBottleneck": X.GhostBottleneck,
            }[mname]
            mod = cls(c2, *args[1:], dtype=dtype)
        elif mname in ("C3Ghost", "C3x", "BottleneckCSP"):
            c2 = _scale_ch(args[0], nc, width, max_channels)
            shortcut = args[1] if len(args) > 1 else True
            cls = {"C3Ghost": X.C3Ghost, "C3x": X.C3x, "BottleneckCSP": X.BottleneckCSP}[mname]
            mod = cls(c2, n=n, shortcut=shortcut, dtype=dtype)
            n = 1
        elif mname == "RepNCSPELAN4":
            # args [c2, c3, c4, n] — c2/c3/c4 width-scaled (reference tasks.py:871)
            c2 = _scale_ch(args[0], nc, width, max_channels)
            c3 = _scale_ch(args[1], nc, width, max_channels)
            c4 = _scale_ch(args[2], nc, width, max_channels)
            mod = X.RepNCSPELAN4(c2, c3, c4, n=args[3] if len(args) > 3 else 1, dtype=dtype)
        elif mname == "ADown":
            c2 = _scale_ch(args[0], nc, width, max_channels)
            mod = X.ADown(c2, dtype=dtype)
        elif mname in ("DBBNCSPELAN4", "RepNCSPELAN4_CAA", "OREPANCSPELAN4", "DRBNCSPELAN4"):
            # v9 ELAN variants (extra block.py:4667/4673/4679/5047): same arg
            # layout as RepNCSPELAN4 [c2, c3, c4, n] (+kernel for DRB)
            c2 = _scale_ch(args[0], nc, width, max_channels)
            c3 = _scale_ch(args[1], nc, width, max_channels)
            c4 = _scale_ch(args[2], nc, width, max_channels)
            inner = {"DBBNCSPELAN4": "dbb", "OREPANCSPELAN4": "orepa",
                     "DRBNCSPELAN4": "drb"}.get(mname, "rep")
            mod = X.RepNCSPELAN4(c2, c3, c4, n=args[3] if len(args) > 3 else 1,
                                 inner=inner, caa=mname.endswith("CAA"),
                                 kernel=args[4] if len(args) > 4 else 7, dtype=dtype)
        elif mname == "CBLinear":
            # args [c2s_list, k?, s?] (reference tasks.py:927): output is the
            # LIST of branch tensors; Index selects one downstream
            c1_ = src_ch(f_list[0])
            c2s = [make_divisible(min(c, max_channels) * width, 8) for c in args[0]]
            c2 = list(c2s)  # multi-output node
            mod = X.CBLinear(tuple(c2s), k=args[1] if len(args) > 1 else 1,
                             s=args[2] if len(args) > 2 else 1, dtype=dtype)
        elif mname == "CBFuse":
            # sums idx-selected CBLinear branches onto the last input
            c2 = src_ch(f_list[-1])
            mod = X.CBFuse(tuple(args[0]))
            list_input = True
        elif mname == "DySample":
            c2 = c1
            mod = X.DySample(*args, dtype=dtype)
        elif mname == "CARAFE":
            c2 = c1
            mod = X.CARAFE(*args, dtype=dtype)
        elif mname == "RevCol":
            # reversible-column backbone (revcol.py:252); YAML args
            # [kernel, [channels], [layers], num_subnet]
            from experiment_yolo_tpu.nn import backbones as BB

            kern = str(args[0]) if args else "C2f"
            chans = tuple(args[1]) if len(args) > 1 else (32, 64, 96, 128)
            lay = tuple(args[2]) if len(args) > 2 else (2, 3, 6, 3)
            nsub = int(args[3]) if len(args) > 3 else 5
            c2 = list(chans)
            mod = BB.RevCol(kernel=kern, chans=chans, layers=lay, num_subnet=nsub, dtype=dtype)
        elif mname in ("FasterNet", "ConvNeXtV2"):
            from experiment_yolo_tpu.nn import backbones as BB

            cls = {"FasterNet": BB.FasterNet, "ConvNeXtV2": BB.ConvNeXtV2}[mname]
            variant = args[0] if args else ("t0" if mname == "FasterNet" else "atto")
            c2 = list(cls.channels(variant))  # multi-output node
            mod = cls(variant=variant, dtype=dtype)
        elif mname in _whole_backbones():
            # callable-name backbone registry (reference tasks.py:939-957):
            # EfficientViT_M0..M5, repvit_m0_9..m2_3, lsknet_t/s,
            # MobileNetV4Conv{Small,Medium,Large}
            cls, variant = _whole_backbones()[mname]
            c2 = list(cls.channels(variant))  # multi-output node
            mod = cls(variant=variant, dtype=dtype)
        elif mname == "Index":
            src = src_ch(f_list[0])
            assert isinstance(src, list), "Index must follow a multi-output backbone"
            c2 = src[args[0]]
            from experiment_yolo_tpu.nn import backbones as BB

            mod = BB.Index(k=args[0])
        elif mname == "SimFusion_3in":
            # reference tasks.py: args [[ch...], c2 scaled]
            inc = tuple(src_ch(j) for j in f_list)
            c2 = _scale_ch(args[0], nc, width, max_channels)
            mod = X.SimFusion3in(c2, inc=inc, dtype=dtype)
        elif mname == "IFM":
            # GOLD-YOLO info-fusion (reference tasks.py:986): args [ouc_list]
            from experiment_yolo_tpu.nn import zoo_blocks as Z

            c2 = sum(args[0])
            mod = Z.IFM(tuple(args[0]), dtype=dtype)
        elif mname == "InjectionMultiSum_Auto_pool":
            # args [oup, global_inp_list, flag] (reference tasks.py:990)
            from experiment_yolo_tpu.nn import zoo_blocks as Z

            c2 = args[0]
            mod = Z.InjectionMultiSum(c2, tuple(args[1]), args[2], dtype=dtype)
        elif mname == "TopBasicLayer":
            # args [embedding_dim, ouc_list] (reference tasks.py:997)
            from experiment_yolo_tpu.nn import zoo_blocks as Z

            c2 = sum(args[1])
            mod = Z.TopBasicLayer(tuple(args[1]), dtype=dtype)
        elif mname in ("CSPStage", "RepBlock", "V7DownSampling"):
            from experiment_yolo_tpu.nn import zoo_blocks as Z

            c2 = _scale_ch(args[0], nc, width, max_channels)
            if mname == "CSPStage":
                mod = Z.CSPStage(c2, n=n, dtype=dtype)
            elif mname == "RepBlock":
                mod = Z.RepBlock(c2, n=n, dtype=dtype)
            else:
                mod = Z.V7DownSampling(c2, dtype=dtype)
            n = 1
        elif mname == "BiFusion":
            # args [c2]; inputs [top, mid, bottom] (reference tasks.py:974)
            from experiment_yolo_tpu.nn import zoo_blocks as Z

            inc = tuple(src_ch(j) for j in f_list)
            c2 = _scale_ch(args[0], nc, width, max_channels)
            mod = Z.BiFusion(c2, inc=inc, dtype=dtype)
        elif mname in ("SimFusion_4in", "AdvPoolFusion"):
            c2 = sum(src_ch(j) for j in f_list)
            mod = X.SimFusion4in() if mname == "SimFusion_4in" else X.AdvPoolFusion()
        elif mname == "PyramidPoolAgg":
            c2 = sum(src_ch(j) for j in f_list)
            mod = X.PyramidPoolAgg(stride=args[0] if args else 2)
        elif mname in ("HGStem", "HGBlock", "Ghost_HGBlock", "Rep_HGBlock", "Dynamic_HGBlock"):
            # reference tasks.py:813: args [cm, c2]; both width-scaled; HGBlock
            # also takes repeats n at arg index 4
            cm = _scale_ch(args[0], nc, width, max_channels)
            c2 = _scale_ch(args[1], nc, width, max_channels)
            if mname == "HGStem":
                mod = X.HGStem(cm, c2, dtype=dtype)
            else:
                extra = args[2:]
                variant = {"Ghost_HGBlock": "ghost", "Rep_HGBlock": "rep",
                           "Dynamic_HGBlock": "dynamic"}.get(mname, "light")
                mod = X.HGBlock(cm, c2, *(extra[:1]), n=n, dtype=dtype,
                                lightconv=bool(extra[1]) if len(extra) > 1 else False,
                                shortcut=bool(extra[2]) if len(extra) > 2 else False,
                                variant=variant)
                n = 1
        elif mname == "ResNetLayer":
            # YAML args carry c1 explicitly: [c1, c2, s, is_first, n]
            # (reference tasks.py: c2 = args[1] if is_first else args[1]*4)
            c2 = args[1] if args[3] else args[1] * 4
            mod = X.ResNetLayer(args[1], s=args[2], is_first=args[3], n=args[4], dtype=dtype)
        elif mname == "AIFI":
            from experiment_yolo_tpu.nn import transformer as T

            c2 = c1
            mod = T.AIFI(cm=args[0], num_heads=args[1] if len(args) > 1 else 8, dtype=dtype)
        elif mname == "RepC3":
            c2 = _scale_ch(args[0], nc, width, max_channels)
            mod = X.RepC3(c2, n=n, dtype=dtype)
            n = 1
        elif mname == "RTDETRDecoder":
            from experiment_yolo_tpu.nn import transformer as T

            ch_in = tuple(src_ch(j) for j in f_list)
            c2 = 0
            # optional YAML size overrides after nc (reference keeps them as
            # constructor kwargs): [nc, hd, nq, ndp, nh, ndl, d_ffn]
            extra = {k: int(vv) for k, vv in
                     zip(("hd", "nq", "ndp", "nh", "ndl", "d_ffn"), args[1:])}
            mod = T.RTDETRDecoder(nc=nc, ch=ch_in, dtype=dtype, **extra)
            detect_idx = i
            list_input = True
        elif mname in ("Detect", "Detect_Efficient", "DetectAux", "Detect_SEAM",
                       "Detect_MultiSEAM", "Detect_LSCD", "Detect_LADH", "Detect_TADDH",
                       "Detect_DyHead", "Detect_DyHeadWithDCNV3", "Detect_DyHeadWithDCNV4",
                       "Detect_DyHead_Prune", "Detect_AFPN_P345", "Detect_AFPN_P345_Custom",
                       "Detect_AFPN_P2345", "Detect_AFPN_P2345_Custom"):
            from experiment_yolo_tpu.nn import heads_extra as H

            ch_in = tuple(src_ch(j) for j in f_list)
            c2 = 0
            if mname == "Detect":
                mod = M.Detect(nc=nc, ch=ch_in, dtype=dtype)
            elif mname == "DetectAux":
                mod = H.DetectAux(nc=nc, ch=ch_in, dtype=dtype)
            elif mname in ("Detect_SEAM", "Detect_MultiSEAM"):
                mod = H.DetectSEAM(nc=nc, ch=ch_in, multi=mname == "Detect_MultiSEAM", dtype=dtype)
            elif mname == "Detect_LSCD":
                # args: [nc, hidc] (extra head.py:497), hidc width-scaled
                hidc = _scale_ch(args[1] if len(args) > 1 else 256, nc, width, max_channels)
                mod = H.DetectLSCD(nc=nc, hidc=hidc, ch=ch_in, dtype=dtype)
            elif mname == "Detect_LADH":
                mod = H.DetectLADH(nc=nc, ch=ch_in, dtype=dtype)
            elif mname.startswith("Detect_DyHead"):
                # args: [nc, hidc, block_num] (extra head.py:28/76/81/380)
                hidc = _scale_ch(args[1] if len(args) > 1 else 256, nc, width, max_channels)
                bn_ = args[2] if len(args) > 2 else 2
                blk = {"Detect_DyHead": "dcnv2", "Detect_DyHeadWithDCNV3": "dcnv3",
                       "Detect_DyHeadWithDCNV4": "dcnv4", "Detect_DyHead_Prune": "prune"}[mname]
                mod = H.DetectDyHead(nc=nc, hidc=hidc, block_num=bn_, ch=ch_in, block=blk, dtype=dtype)
            elif mname.startswith("Detect_AFPN_P"):
                # args: [nc, hidc] (extra head.py:94/151/163); P2345 reads a
                # four-level P2-P5 pyramid
                hidc = _scale_ch(args[1] if len(args) > 1 else 256, nc, width, max_channels)
                mod = H.DetectAFPN(nc=nc, hidc=hidc, ch=ch_in,
                                   custom=mname.endswith("Custom"), dtype=dtype)
            elif mname == "Detect_TADDH":
                # args: [nc, hidc] — input levels must carry hidc channels
                hidc = _scale_ch(args[1] if len(args) > 1 else 256, nc, width, max_channels)
                mod = H.DetectTADDH(nc=nc, hidc=hidc, ch=ch_in, dtype=dtype)
            else:
                mod = H.DetectEfficient(nc=nc, ch=ch_in, dtype=dtype)
            detect_idx = i
            reg_max = mod.reg_max
            list_input = True
        elif mname in ("Segment_LSCD", "Pose_LSCD", "OBB_LSCD", "Segment_Efficient",
                       "Segment_LADH", "Pose_LADH", "OBB_LADH",
                       "Segment_TADDH", "Pose_TADDH", "OBB_TADDH"):
            from experiment_yolo_tpu.nn import heads_extra as H

            ch_in = tuple(src_ch(j) for j in f_list)
            c2 = 0
            if mname in ("Segment_LSCD", "Segment_TADDH"):
                nm = args[1] if len(args) > 1 else 32
                npr = _scale_ch(args[2] if len(args) > 2 else 256, nc, width, max_channels)
                hidc = _scale_ch(args[3] if len(args) > 3 else 256, nc, width, max_channels)
                cls_ = H.SegmentLSCD if mname == "Segment_LSCD" else H.SegmentTADDH
                mod = cls_(nc=nc, nm=nm, npr=npr, hidc=hidc, ch=ch_in, dtype=dtype)
            elif mname in ("Pose_LSCD", "Pose_TADDH"):
                ks = args[1] if len(args) > 1 else (17, 3)
                if isinstance(ks, str):
                    ks = d.get("kpt_shape", (17, 3))
                hidc = _scale_ch(args[2] if len(args) > 2 else 256, nc, width, max_channels)
                cls_ = H.PoseLSCD if mname == "Pose_LSCD" else H.PoseTADDH
                mod = cls_(nc=nc, kpt_shape=tuple(ks), hidc=hidc, ch=ch_in, dtype=dtype)
            elif mname in ("OBB_LSCD", "OBB_TADDH"):
                hidc = _scale_ch(args[2] if len(args) > 2 else 256, nc, width, max_channels)
                cls_ = H.OBBLSCD if mname == "OBB_LSCD" else H.OBBTADDH
                mod = cls_(nc=nc, ne=args[1] if len(args) > 1 else 1, hidc=hidc, ch=ch_in, dtype=dtype)
            elif mname == "Segment_LADH":
                nm = args[1] if len(args) > 1 else 32
                npr = _scale_ch(args[2] if len(args) > 2 else 256, nc, width, max_channels)
                mod = H.SegmentLADH(nc=nc, nm=nm, npr=npr, ch=ch_in, dtype=dtype)
            elif mname == "Pose_LADH":
                ks = args[1] if len(args) > 1 else (17, 3)
                if isinstance(ks, str):
                    ks = d.get("kpt_shape", (17, 3))
                mod = H.PoseLADH(nc=nc, kpt_shape=tuple(ks), ch=ch_in, dtype=dtype)
            elif mname == "OBB_LADH":
                mod = H.OBBLADH(nc=nc, ne=args[1] if len(args) > 1 else 1, ch=ch_in, dtype=dtype)
            else:
                nm = args[1] if len(args) > 1 else 32
                npr = _scale_ch(args[2] if len(args) > 2 else 256, nc, width, max_channels)
                mod = H.SegmentEfficient(nc=nc, nm=nm, npr=npr, ch=ch_in, dtype=dtype)
            detect_idx = i
            list_input = True
        elif mname in ("Segment", "Pose", "OBB"):
            # task heads (reference head.py:90/147/116); args after nc:
            # Segment [nm, npr(width-scaled)], Pose [kpt_shape], OBB [ne]
            from experiment_yolo_tpu.nn import heads_extra as H

            ch_in = tuple(src_ch(j) for j in f_list)
            c2 = 0
            if mname == "Segment":
                nm = args[1] if len(args) > 1 else 32
                npr = _scale_ch(args[2] if len(args) > 2 else 256, nc, width, max_channels)
                mod = H.Segment(nc=nc, nm=nm, npr=npr, ch=ch_in, dtype=dtype)
            elif mname == "Pose":
                ks = args[1] if len(args) > 1 else (17, 3)
                if isinstance(ks, str):  # literal 'kpt_shape' -> top-level key
                    ks = d.get("kpt_shape", (17, 3))
                mod = H.Pose(nc=nc, kpt_shape=tuple(ks), ch=ch_in, dtype=dtype)
            else:
                mod = H.OBB(nc=nc, ne=args[1] if len(args) > 1 else 1, ch=ch_in, dtype=dtype)
            detect_idx = i
            list_input = True
        else:
            raise NotImplementedError(
                f"module {mname!r} is not yet in the TPU registry (layer {i}); "
                f"see SURVEY.md §2.4 for the port queue"
            )

        if n > 1:  # repeat wrapper for plain modules (rare in these configs)
            mod = Repeated(mods=tuple(mod for _ in range(n)))

        abs_f = tuple(j if j == -1 else (j % i if j < 0 else j) for j in f_list)
        for j in abs_f:
            if j != -1:
                save.add(j)
        layers.append(LayerSpec(mod, abs_f, i, mname, c2, list_input))
        if verbose:
            LOGGER.info(f"{i:>3}{str(list(abs_f)):>18}{n:>3}  {mname:<22}{str(args):<30}")
        if i == 0:
            chs = []
        chs.append(c2)

    return layers, sorted(save), detect_idx, nc, reg_max


class Repeated(nn.Module):
    mods: Tuple[Any, ...]

    @nn.compact
    def __call__(self, x, train: bool = False):
        for m in self.mods:
            x = m(x, train)
        return x


class GraphModel(nn.Module):
    """Executes a parsed layer graph with savelist routing.

    Functional counterpart of the reference's ``BaseModel._predict_once``
    (nn/tasks.py:85-127). The returned value is the output of the last
    layer — for detection models, the list of raw per-level Detect maps.
    """

    layers: Tuple[Any, ...]
    froms: Tuple[Tuple[int, ...], ...]
    list_inputs: Tuple[bool, ...]
    save: Tuple[int, ...]
    kw: Any = None  # KWManager plan (kernel_warehouse.py) or None

    @nn.compact
    def __call__(self, x, train: bool = False, capture: Tuple[int, ...] = (), kw_temp=0.0,
                 dn_gt=None, dn_rng=None, remat: Any = False):
        kw_cells = self.kw.warehouse_params(self) if self.kw is not None else None
        saved: Dict[int, Any] = {}
        captured: Dict[int, Any] = {}
        # Per-layer rematerialization (``remat``, train only): a rematted
        # layer's INTERNAL activations are recomputed in the backward pass so
        # only the inter-layer boundary tensors are saved — the TPU analogue
        # of torch.utils.checkpoint on every block. This trades ~1 extra
        # forward (compute is <5% of the bandwidth-bound train step) for the
        # HBM headroom to run batch 128, where XLA's batch-minor conv-grad
        # layouts fill all 128 lanes (at batch 32 they are 25% occupied).
        # ``remat`` is bool (all layers) or int: only layers whose input
        # spatial area H*W >= remat are rematted (the high-resolution layers
        # hold nearly all the residual bytes; skipping the small-HW tail
        # skips its recompute cost for free).
        # enabled for True or ANY int (including 0 = "remat every layer",
        # consistent with the documented min-H*W semantics); only False/None
        # disable
        remat_on = train and remat is not False and remat is not None
        run_remat = nn.remat(lambda mdl, inp: mdl(inp, True)) if remat_on else None
        hw_min = remat if isinstance(remat, int) and not isinstance(remat, bool) else 0

        def _input_hw(t) -> int:
            if isinstance(t, (list, tuple)):
                t = t[0]
            shape = getattr(t, "shape", ())
            return int(shape[1] * shape[2]) if len(shape) == 4 else 0

        out = x
        for i, (m, f, li) in enumerate(zip(self.layers, self.froms, self.list_inputs)):
            if li:
                inp = [out if j == -1 else saved[j] for j in f]
            else:
                inp = out if f[0] == -1 else saved[f[0]]
            if getattr(m, "kw_aware", False):
                out = m(inp, train, warehouse=kw_cells, kw_temp=kw_temp)
            elif getattr(m, "dn_aware", False) and dn_gt is not None:
                out = m(inp, train, dn_gt=dn_gt, dn_rng=dn_rng)
            elif run_remat is not None and _input_hw(inp) >= hw_min:
                out = run_remat(m, inp)
            else:
                out = m(inp, train)
            if i in self.save:
                saved[i] = out
            if i in capture:
                captured[i] = out
        if capture:  # feature taps (the reference's YOLO.embed, model.py:368)
            return out, [captured[i] for i in capture]
        return out


def guess_model_scale(path) -> str:
    """Extract scale char from a path like 'yolov8n.yaml' -> 'n'."""
    m = re.search(r"yolov\d+([nslmx])", Path(str(path)).stem)
    return m.group(1) if m else ""


def yaml_model_load(path) -> dict:
    """Load a model YAML; resolves unified paths like yolov8n.yaml ->
    cfg/models/yolov8.yaml with scale 'n' (reference tasks.py:1065)."""
    path = Path(path)
    stem = path.stem
    unified = re.sub(r"(\d+)([nslmx])(.*)$", r"\1\3", stem)  # yolov8n-ASF -> yolov8-ASF
    candidates = [path]
    if not path.exists():
        for name in (stem, unified):
            candidates += [ROOT / "cfg" / "models" / f"{name}.yaml"]
    for cand in candidates:
        if Path(cand).exists():
            d = yaml_load(cand)
            d["scale"] = guess_model_scale(stem) or d.get("scale")
            d["yaml_file"] = str(path)
            return d
    raise FileNotFoundError(f"model yaml {path} not found (searched {candidates})")


class DetectionModel:
    """YOLO detection model: graph module + params + decode metadata.

    Counterpart of the reference's ``DetectionModel`` (nn/tasks.py:275) in a
    functional style: parameters are a pytree owned by the caller;
    ``apply`` is pure; strides come from a zero-FLOP ``jax.eval_shape`` dry
    run; Detect class/box bias priors are written into the init params.
    """

    task = "detect"

    def __init__(self, cfg="yolov8n.yaml", ch: int = 3, nc: Optional[int] = None, dtype=jnp.float32, verbose: bool = False,
                 packed_decode: bool = False):
        # packed_decode: 128-lane packed DFL decode at inference (same math;
        # ops/anchors.py:dfl_decode_packed) — A/B'd in bench.py
        self.packed_decode = packed_decode
        self.yaml = cfg if isinstance(cfg, dict) else yaml_model_load(cfg)
        if nc and nc != self.yaml.get("nc"):
            self.yaml["nc"] = nc
        scale = self.yaml.get("scale")
        extras: Dict[str, Any] = {"kw_manager": None}
        layers, save, detect_idx, self.nc, self.reg_max = parse_model(
            self.yaml, ch, scale=scale, dtype=dtype, verbose=verbose, out_extras=extras
        )
        self.kw_manager = extras.get("kw_manager")
        if self.kw_manager is not None:
            self.kw_manager.store()
        self.specs = layers
        self.detect_idx = detect_idx
        self.module = GraphModel(
            layers=tuple(s.module for s in layers),
            froms=tuple(s.f for s in layers),
            list_inputs=tuple(s.is_list_input for s in layers),
            save=tuple(save),
            kw=self.kw_manager,
        )
        self.no = self.nc + 4 * self.reg_max
        self.names = {i: f"{i}" for i in range(self.nc)}
        self.args: Dict[str, Any] = {}
        self.head_type = layers[detect_idx].type if detect_idx >= 0 else "Detect"
        if self.head_type == "RTDETRDecoder":
            self.strides = (8, 16, 32)  # query-based head: nominal pyramid strides
        else:
            self.strides = self._calibrate_strides(ch)
        self.nl = len(self.strides)

    # -- construction ------------------------------------------------------
    def _calibrate_strides(self, ch: int, imgsz: int = 256) -> Tuple[int, ...]:
        """Stride dry run via eval_shape (reference tasks.py:303-330)."""
        x = jax.ShapeDtypeStruct((1, imgsz, imgsz, ch), jnp.float32)
        rng = jax.random.PRNGKey(0)
        vars_shape = jax.eval_shape(lambda r, xx: self.module.init(r, xx, False), rng, x)
        outs = jax.eval_shape(lambda v, xx: self.module.apply(v, xx, False), vars_shape, x)
        if self.head_type.startswith(("Segment", "Pose", "OBB")):
            outs = outs[0]  # (det_maps, task_branch...) -> det maps
        return tuple(int(imgsz // o.shape[1]) for o in outs)

    def init(self, rng, imgsz: int = 64) -> dict:
        """Initialize variables ({'params', 'batch_stats'}) with Detect priors.

        Parameter shapes are image-size independent, so init runs at a tiny
        resolution (jitted) regardless of the training imgsz.
        """
        x = jnp.zeros((1, imgsz, imgsz, 3), jnp.float32)
        variables = jax.jit(lambda r: self.module.init(r, x, False))(rng)
        return self._bias_init(variables)

    def _bias_init(self, variables: dict) -> dict:
        """Detect bias priors (reference head.py:78-87): box bias 1.0,
        cls bias log(5 / nc / (640/stride)^2)."""
        variables = unfreeze(variables)
        params = variables["params"]
        dname = f"layers_{self.detect_idx}"
        outer = params.get(dname)
        head = outer
        if head is not None and "detect" in head:  # Segment/Pose/OBB/DetectAux nest Detect
            head = head["detect"]
        if head is not None and "cv2" in head and "cv3" in head:
            # shared-conv heads (Detect_LSCD, extra head.py:566): single
            # cv2/cv3 projections, cls prior pinned at the stride-16 level
            head["cv2"]["bias"] = jnp.ones_like(head["cv2"]["bias"])
            prior = math.log(5 / self.nc / (640 / 16) ** 2)
            head["cv3"]["bias"] = jnp.full_like(head["cv3"]["bias"], prior)
        if head is not None:
            for i, s in enumerate(self.strides):
                if f"cv2_{i}_2" in head:
                    head[f"cv2_{i}_2"]["bias"] = jnp.ones_like(head[f"cv2_{i}_2"]["bias"])
                if f"cv3_{i}_2" in head:
                    prior = math.log(5 / self.nc / (640 / s) ** 2)
                    head[f"cv3_{i}_2"]["bias"] = jnp.full_like(head[f"cv3_{i}_2"]["bias"], prior)
                # DetectAux keeps its aux branches at the outer level
                # (reference extra head.py:295 bias_init covers cv4/cv5 too)
                if outer is not None and f"cv4_{i}_2" in outer and self.head_type == "DetectAux":
                    prior = math.log(5 / self.nc / (640 / s) ** 2)
                    outer[f"cv4_{i}_2"]["bias"] = jnp.ones_like(outer[f"cv4_{i}_2"]["bias"])
                    outer[f"cv5_{i}_2"]["bias"] = jnp.full_like(outer[f"cv5_{i}_2"]["bias"], prior)
        return variables

    def _check_input(self, x):
        """Clear error for spatial dims not divisible by the max stride.

        Mirrors the reference's check_imgsz guard (utils/checks.py) at the
        library layer — without this, a bad size surfaces as an obscure
        shape-mismatch deep in a Concat."""
        if x.ndim != 4:
            raise ValueError(
                f"expected a batched NHWC input of rank 4, got shape "
                f"{tuple(x.shape)} (rank {x.ndim}); add a batch dim with "
                f"x[None] for a single image"
            )
        s = max(self.strides)
        h, w = x.shape[1], x.shape[2]
        if h % s or w % s:
            raise ValueError(
                f"input spatial dims {h}x{w} must be divisible by the model's "
                f"max stride {s}; pass an imgsz that check_imgsz/letterbox "
                f"would produce (e.g. {max(s, -(-h // s) * s)}x"
                f"{max(s, -(-w // s) * s)})"
            )

    # -- functional forward ------------------------------------------------
    def apply(self, variables, x, train: bool = False, mutable=False, kw_temp=0.0,
              dn_gt=None, dn_rng=None, remat: bool = False):
        """Raw forward: returns list of per-level (B,H,W,no) maps.

        With train=True and mutable=['batch_stats'], returns (feats, updates).
        `kw_temp` is the Kernel-Warehouse temperature (0 = learned mixture
        only — the inference setting, reference tasks.py:301). `dn_gt` /
        `dn_rng` feed RT-DETR contrastive denoising groups in training.
        `remat=True` recomputes per-layer internals in the backward pass
        (large-batch training).
        """
        self._check_input(x)
        return self.module.apply(variables, x, train, mutable=mutable, kw_temp=kw_temp,
                                 dn_gt=dn_gt, dn_rng=dn_rng, remat=remat)

    def predict(self, variables, x):
        """Inference decode: (boxes xywh pixels (B,A,4), scores (B,A,nc)).

        RT-DETR heads decode internally (normalized cxcywh + sigmoided
        scores over nq queries); Detect heads go through make_anchors + DFL.
        """
        from experiment_yolo_tpu.ops.anchors import decode_detections

        self._check_input(x)
        out = self.module.apply(variables, x, False)
        if self.head_type == "RTDETRDecoder":
            h, w = x.shape[1:3]
            scale = jnp.asarray([w, h, w, h], out.dtype)
            return out[..., :4] * scale, out[..., 4:]
        return decode_detections(out, self.strides, self.nc, self.reg_max,
                                 packed=getattr(self, "packed_decode", False))

    def num_params(self, variables) -> int:
        return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))

    def num_params_static(self) -> int:
        """Trainable param count via eval_shape — no compute, no compile."""
        x = jax.ShapeDtypeStruct((1, 64, 64, 3), jnp.float32)
        rng = jax.random.PRNGKey(0)
        vs = jax.eval_shape(lambda r, xx: self.module.init(r, xx, False), rng, x)
        return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(vs["params"]))

    def profile(self, variables=None, imgsz: int = 640, verbose: bool = True):
        """Per-layer FLOPs/param table (reference BaseModel._profile_one_layer,
        nn/tasks.py:136 + Model.profile model.py:764): every graph layer is
        lowered standalone through eval_shape + XLA cost_analysis — no device
        run needed, so it also works without a chip attached."""
        import numpy as np

        rows = []
        x = jnp.zeros((1, imgsz, imgsz, 3), jnp.float32)
        rng = jax.random.PRNGKey(0)
        # trace the graph once abstractly to learn each layer's input shapes
        shapes: Dict[int, Any] = {}
        saved: Dict[int, Any] = {}
        vs = jax.eval_shape(lambda: self.module.init(rng, x, False))
        out = jax.ShapeDtypeStruct(x.shape, x.dtype)
        for i, spec in enumerate(self.specs):
            f = spec.f
            if spec.is_list_input:
                inp = [out if j == -1 else saved[j] for j in f]
            else:
                inp = out if f[0] == -1 else saved[f[0]]
            shapes[i] = inp
            sub = {"params": vs["params"].get(f"layers_{i}", {})}
            bs = vs.get("batch_stats", {}).get(f"layers_{i}")
            if bs:
                sub["batch_stats"] = bs
            mod = spec.module

            def run(vv, ii, mod=mod):
                return mod.apply(vv, ii, False)

            try:
                lowered = jax.jit(run).lower(sub, inp)
                cost = lowered.cost_analysis() or {}
                flops = float((cost[0] if isinstance(cost, (list, tuple)) else cost).get("flops", 0.0))
            except Exception:
                flops = float("nan")
            out = jax.eval_shape(run, sub, inp)
            saved[i] = out
            n_par = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(sub["params"]))
            rows.append({"i": i, "type": spec.type, "params": n_par, "gflops": flops / 1e9})
        if verbose:
            from experiment_yolo_tpu.utils import LOGGER

            LOGGER.info(f"{'idx':>4} {'GFLOPs':>10} {'params':>10}  type")
            for r in rows:
                LOGGER.info(f"{r['i']:>4} {r['gflops']:>10.3f} {r['params']:>10}  {r['type']}")
            LOGGER.info(f"total: {sum(r['gflops'] for r in rows if r['gflops'] == r['gflops']):.2f} GFLOPs, "
                        f"{sum(r['params'] for r in rows):,} params @ {imgsz}px")
        return rows

    def info(self, variables=None) -> str:
        n = self.num_params(variables) if variables else -1
        return f"DetectionModel(nc={self.nc}, strides={self.strides}, params={n:,})"


class SegmentationModel(DetectionModel):
    """Instance segmentation model (reference nn/tasks.py:392).

    ``predict`` returns (boxes xywh px, scores, coeffs (B,A,nm),
    protos (B,Hp,Wp,nm)); mask assembly for post-NMS detections lives in
    ``nn.heads_extra.assemble_masks``.
    """

    task = "segment"

    def predict(self, variables, x):
        from experiment_yolo_tpu.ops.anchors import decode_detections

        self._check_input(x)
        det, coeffs, protos = self.module.apply(variables, x, False)
        boxes, scores = decode_detections(det, self.strides, self.nc, self.reg_max)
        b = x.shape[0]
        nm = protos.shape[-1]
        flat_coeffs = jnp.concatenate([c.reshape(b, -1, nm) for c in coeffs], axis=1)
        return boxes, scores, flat_coeffs, protos

    def info(self, variables=None) -> str:
        n = self.num_params(variables) if variables else -1
        return f"SegmentationModel(nc={self.nc}, strides={self.strides}, params={n:,})"


class PoseModel(DetectionModel):
    """Pose/keypoints model (reference nn/tasks.py:404).

    ``predict`` returns (boxes xywh px, scores, kpts (B,A,nk,nd) in px)."""

    task = "pose"

    def __init__(self, cfg="yolov8-pose.yaml", *a, **kw):
        super().__init__(cfg, *a, **kw)
        self.kpt_shape = tuple(self.specs[self.detect_idx].module.kpt_shape)

    def predict(self, variables, x):
        from experiment_yolo_tpu.nn.heads_extra import decode_kpts
        from experiment_yolo_tpu.ops.anchors import decode_detections

        self._check_input(x)
        det, kpt_maps = self.module.apply(variables, x, False)
        boxes, scores = decode_detections(det, self.strides, self.nc, self.reg_max)
        kpts = decode_kpts(kpt_maps, self.strides, self.kpt_shape)
        return boxes, scores, kpts

    def info(self, variables=None) -> str:
        n = self.num_params(variables) if variables else -1
        return f"PoseModel(nc={self.nc}, kpt_shape={self.kpt_shape}, params={n:,})"


class OBBModel(DetectionModel):
    """Oriented-box model (reference nn/tasks.py:380).

    ``predict`` returns (rboxes (B,A,5) xywhr px, scores)."""

    task = "obb"

    def predict(self, variables, x):
        from experiment_yolo_tpu.nn.heads_extra import decode_obb_angle
        from experiment_yolo_tpu.ops.anchors import decode_rboxes

        self._check_input(x)
        det, angle_maps = self.module.apply(variables, x, False)
        angle = decode_obb_angle(angle_maps)  # (B, A, 1)
        return decode_rboxes(det, angle, self.strides, self.nc, self.reg_max)

    def info(self, variables=None) -> str:
        n = self.num_params(variables) if variables else -1
        return f"OBBModel(nc={self.nc}, strides={self.strides}, params={n:,})"


def guess_model_task(cfg) -> str:
    """Task from a model yaml path/dict (reference tasks.py:1102)."""
    name = str(cfg.get("yaml_file", "")) if isinstance(cfg, dict) else str(cfg)
    head = ""
    if isinstance(cfg, dict):
        rows = list(cfg.get("head", [])) or list(cfg.get("backbone", []))
        head = rows[-1][2] if rows else ""
    for key, task in (("-seg", "segment"), ("-pose", "pose"), ("-obb", "obb"), ("-cls", "classify")):
        if key in name:
            return task
    for prefix, task in (("Segment", "segment"), ("Pose", "pose"), ("OBB", "obb"), ("Classify", "classify")):
        if str(head).startswith(prefix):
            return task
    return "detect"


TASK_MODELS = {
    "detect": DetectionModel,
    "segment": SegmentationModel,
    "pose": PoseModel,
    "obb": OBBModel,
}
