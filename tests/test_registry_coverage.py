"""Registry completeness vs the reference's parse_model (SURVEY §2.2/§2.4).

Extracts every module name the reference's parse_model can construct (the
membership sets in /root/reference/ultralytics/nn/tasks.py:780-1063) and
asserts our registry resolves ALL of them except the documented
upstream-broken variants (docs/ROADMAP.md)."""

import re
from pathlib import Path

import pytest

REF = Path("/root/reference/ultralytics/nn/tasks.py")

# Variants the REFERENCE itself cannot construct (upstream bugs, documented
# in docs/ROADMAP.md): MobileNetV4Hybrid spec dicts are empty upstream;
# vanillanet ada_pool scale is broken upstream.
UPSTREAM_BROKEN = {
    "MobileNetV4HybridLarge",
    "MobileNetV4HybridMedium",
    "vanillanet_13_x1_5_ada_pool",
}


def _reference_names():
    txt = REF.read_text()
    body = txt[txt.index("def parse_model"):]
    names = set()
    for m in re.finditer(r"\bm (?:in|is) [\({\[]([^)}\]]+)[\)}\]]", body):
        names.update(re.findall(r"\b([A-Za-z_][A-Za-z0-9_]*)\b", m.group(1)))
    for m in re.finditer(r"elif m in \{([^}]+)\}", body):
        names.update(re.findall(r"\b([A-Za-z_][A-Za-z0-9_]*)\b", m.group(1)))
    names -= {"in", "is", "if", "elif", "m", "nn", "Upsample", "torch",
              "Conv2d", "ConvTranspose2d", "Conv2d_BN"}
    keep_lower = ("repvit", "lsknet", "unireplknet", "vanillanet",
                  "convnextv2", "fasternet", "transnext", "efficientformerv2")
    return {n for n in names if not n.islower() or n.startswith(keep_lower)}


@pytest.mark.skipif(not REF.exists(), reason="reference not mounted")
def test_registry_resolves_every_reference_name():
    from experiment_yolo_tpu.nn.backbones import WHOLE_BACKBONES
    from experiment_yolo_tpu.nn.zoo_blocks import INNER_BLOCKS

    src = (Path(__file__).resolve().parents[1]
           / "experiment_yolo_tpu" / "nn" / "tasks.py").read_text()
    absent = []
    for name in sorted(_reference_names()):
        ok = bool(re.search(rf"[\"']{re.escape(name)}[\"']", src)) or name in WHOLE_BACKBONES
        if not ok and (name.startswith("C2f_") or name.startswith("C3_")):
            ok = name.split("_", 1)[1] in INNER_BLOCKS
        if not ok:
            absent.append(name)
    unexpected = set(absent) - UPSTREAM_BROKEN
    assert not unexpected, f"registry misses reference-constructible names: {sorted(unexpected)}"
