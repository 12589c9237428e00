"""Convert torch state_dicts (torchvision ResNet / reference PoseNet
snapshots) into Flax param/batch_stats pytrees.

Replaces the reference's online model-zoo init (``common/nets/resnet.py:
init_weights`` -> ``model_zoo.load_url``): this environment has no network,
so pretrained weights arrive as .pth files and are converted offline.

Weight layout mapping (validated numerically in tests/test_convert.py):
- Conv2d      (out, in, kh, kw) -> (kh, kw, in, out)
- ConvTranspose2d (in, out, kh, kw) -> (kh, kw, in, out) with the spatial
  taps flipped (torch's transposed conv correlates; lax.conv_transpose
  convolves).
- BatchNorm   weight->scale, bias->bias; running stats -> batch_stats.

Usage:
    python tools/convert_torch_ckpt.py resnet50.pth out.msgpack --kind backbone
    python tools/convert_torch_ckpt.py snapshot_24.pth.tar out.msgpack --kind posenet
"""

from __future__ import annotations

import argparse
from typing import Dict, Mapping, Tuple

import numpy as np


def _np(t) -> np.ndarray:
    import torch

    if isinstance(t, torch.Tensor):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def _conv_w(w) -> np.ndarray:
    return _np(w).transpose(2, 3, 1, 0)  # OIHW -> HWIO


def _deconv_w(w) -> np.ndarray:
    # torch ConvTranspose2d weight is (in, out, kh, kw); flax wants
    # (kh, kw, in, out) with spatially flipped taps.
    return _np(w).transpose(2, 3, 0, 1)[::-1, ::-1].copy()


def _bn(sd: Mapping, prefix: str) -> Tuple[Dict, Dict]:
    params = {"scale": _np(sd[prefix + ".weight"]), "bias": _np(sd[prefix + ".bias"])}
    stats = {
        "mean": _np(sd[prefix + ".running_mean"]),
        "var": _np(sd[prefix + ".running_var"]),
    }
    return params, stats


def convert_backbone(
    sd: Mapping,
    resnet_type: int,
    prefix: str = "",
    s2d_stem: bool = False,
    bgr_input: bool = False,
) -> Tuple[Dict, Dict]:
    """torchvision-style ResNet state_dict -> (params, batch_stats) for
    ihpr_tpu.models.ResNetBackbone. ``prefix`` strips e.g. 'backbone.'.
    ``s2d_stem`` embeds the 7x7 stem into the exact space-to-depth form.
    ``bgr_input`` reverses the stem's input-channel axis: reference training
    snapshots were trained on cv2 BGR frames while this pipeline feeds RGB,
    so without the reversal a converted snapshot silently sees swapped
    R/B channels (torchvision ImageNet weights are already RGB)."""
    from ihpr_tpu.models.resnet import RESNET_SPECS, s2d_stem_kernel

    kind, depths, _ = RESNET_SPECS[resnet_type]
    p: Dict = {}
    s: Dict = {}

    def bn_into(dst_name: str, src_prefix: str):
        bp, bs = _bn(sd, src_prefix)
        p[dst_name] = {"BatchNorm_0": bp}
        s[dst_name] = {"BatchNorm_0": bs}

    stem = _conv_w(sd[prefix + "conv1.weight"])
    if bgr_input:
        stem = stem[:, :, ::-1, :].copy()  # HWIO: reverse input channels
    if s2d_stem:
        stem = s2d_stem_kernel(stem)
    p["conv1"] = {"kernel": stem}
    bn_into("bn1", prefix + "bn1")

    n_convs = 2 if kind == "basic" else 3
    for stage, depth in enumerate(depths):
        for i in range(depth):
            src = f"{prefix}layer{stage + 1}.{i}"
            dst = f"layer{stage + 1}_{i}"
            blk_p: Dict = {}
            blk_s: Dict = {}
            for c in range(1, n_convs + 1):
                blk_p[f"conv{c}"] = {"kernel": _conv_w(sd[f"{src}.conv{c}.weight"])}
                bp, bs = _bn(sd, f"{src}.bn{c}")
                blk_p[f"bn{c}"] = {"BatchNorm_0": bp}
                blk_s[f"bn{c}"] = {"BatchNorm_0": bs}
            if f"{src}.downsample.0.weight" in sd:
                blk_p["down_conv"] = {
                    "kernel": _conv_w(sd[f"{src}.downsample.0.weight"])
                }
                bp, bs = _bn(sd, f"{src}.downsample.1")
                blk_p["down_bn"] = {"BatchNorm_0": bp}
                blk_s["down_bn"] = {"BatchNorm_0": bs}
            p[dst] = blk_p
            s[dst] = blk_s
    return p, s


def convert_head(
    sd: Mapping, num_layers: int = 3, prefix: str = "head."
) -> Tuple[Dict, Dict]:
    """Reference HeadNet state_dict -> (params, batch_stats) for DeconvHead.

    Accepts both module-name layouts: ``deconv_layers.N`` / ``final_layer``
    (the upstream reference's HeadNet attribute names, main/model.py) and
    ``deconv.N`` / ``final`` (tools/torch_reference.py)."""
    if f"{prefix}deconv_layers.0.weight" in sd:
        seq, final = "deconv_layers", "final_layer"
    else:
        seq, final = "deconv", "final"
    p: Dict = {}
    s: Dict = {}
    for i in range(num_layers):
        p[f"deconv{i + 1}"] = {
            "kernel": _deconv_w(sd[f"{prefix}{seq}.{3 * i}.weight"])
        }
        bp, bs = _bn(sd, f"{prefix}{seq}.{3 * i + 1}")
        p[f"bn{i + 1}"] = {"BatchNorm_0": bp}
        s[f"bn{i + 1}"] = {"BatchNorm_0": bs}
    p["final"] = {
        "kernel": _conv_w(sd[f"{prefix}{final}.weight"]),
        "bias": _np(sd[f"{prefix}{final}.bias"]),
    }
    return p, s


def convert_posenet(
    sd: Mapping, resnet_type: int, num_deconv: int = 3, bgr_input: bool = True
):
    """Full PoseNet (backbone.* + head.*) -> (params, batch_stats).

    ``bgr_input`` defaults True: reference training snapshots
    (main/train.py + cv2 loader) saw BGR input; converting for this RGB
    pipeline requires reversing the stem's input channels. Pass False for
    snapshots trained on RGB (e.g. tools/torch_reference.py)."""
    bp, bs = convert_backbone(sd, resnet_type, prefix="backbone.", bgr_input=bgr_input)
    hp, hs = convert_head(sd, num_deconv, prefix="head.")
    return {"backbone": bp, "head": hp}, {"backbone": bs, "head": hs}


def flax_to_torch_state_dict(
    params: Mapping, batch_stats: Mapping, resnet_type: int, num_deconv: int = 3
) -> Dict:
    """Inverse of ``convert_posenet`` (RGB order preserved): our trained
    Flax PoseNet -> a torch state_dict loadable by
    ``tools/torch_reference.PoseNet``. Used by the accuracy-evidence loop to
    run the SAME trained network through the torch-CPU oracle."""
    import torch

    from ihpr_tpu.models.resnet import RESNET_SPECS

    kind, depths, _ = RESNET_SPECS[resnet_type]

    def t(a) -> "torch.Tensor":
        return torch.from_numpy(np.ascontiguousarray(np.asarray(a, np.float32)))

    sd: Dict = {}

    def put_conv(name, kern):  # HWIO -> OIHW
        sd[f"{name}.weight"] = t(np.transpose(kern, (3, 2, 0, 1)))

    def put_bn(name, p, s):
        bn_p, bn_s = p["BatchNorm_0"], s["BatchNorm_0"]
        sd[f"{name}.weight"] = t(bn_p["scale"])
        sd[f"{name}.bias"] = t(bn_p["bias"])
        sd[f"{name}.running_mean"] = t(bn_s["mean"])
        sd[f"{name}.running_var"] = t(bn_s["var"])
        sd[f"{name}.num_batches_tracked"] = torch.zeros((), dtype=torch.long)

    bp, bs = params["backbone"], batch_stats["backbone"]
    stem = np.asarray(bp["conv1"]["kernel"])
    if stem.shape[:3] != (7, 7, 3):
        raise ValueError(
            f"stem kernel {stem.shape} is not the 7x7x3 layout; the "
            "space-to-depth stem is not invertible here — train with "
            "s2d_stem=False for oracle comparisons"
        )
    put_conv("backbone.conv1", stem)
    put_bn("backbone.bn1", bp["bn1"], bs["bn1"])
    n_convs = 2 if kind == "basic" else 3
    for stage, depth in enumerate(depths):
        for i in range(depth):
            src = f"layer{stage + 1}_{i}"
            dst = f"backbone.layer{stage + 1}.{i}"
            for c in range(1, n_convs + 1):
                put_conv(f"{dst}.conv{c}", bp[src][f"conv{c}"]["kernel"])
                put_bn(f"{dst}.bn{c}", bp[src][f"bn{c}"], bs[src][f"bn{c}"])
            if "down_conv" in bp[src]:
                put_conv(f"{dst}.downsample.0", bp[src]["down_conv"]["kernel"])
                put_bn(f"{dst}.downsample.1", bp[src]["down_bn"], bs[src]["down_bn"])

    hp, hs = params["head"], batch_stats["head"]
    for i in range(num_deconv):
        # inverse of _deconv_w: unflip taps, (kh,kw,in,out) -> (in,out,kh,kw)
        k = np.asarray(hp[f"deconv{i + 1}"]["kernel"])[::-1, ::-1]
        sd[f"head.deconv.{3 * i}.weight"] = t(np.transpose(k, (2, 3, 0, 1)))
        put_bn(f"head.deconv.{3 * i + 1}", hp[f"bn{i + 1}"], hs[f"bn{i + 1}"])
    sd["head.final.weight"] = t(
        np.transpose(np.asarray(hp["final"]["kernel"]), (3, 2, 0, 1))
    )
    sd["head.final.bias"] = t(hp["final"]["bias"])
    return sd


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("src", help=".pth / .pth.tar input")
    ap.add_argument("dst", help="output .msgpack (flax serialized)")
    ap.add_argument("--kind", choices=["backbone", "posenet"], default="backbone")
    ap.add_argument("--resnet", type=int, default=50)
    ap.add_argument(
        "--input_order",
        choices=["auto", "rgb", "bgr"],
        default="auto",
        help="channel order the snapshot was TRAINED on (auto: backbone=rgb "
        "torchvision, posenet=bgr reference cv2); bgr reverses the stem's "
        "input channels for this RGB pipeline",
    )
    args = ap.parse_args()

    import torch
    from flax import serialization

    blob = torch.load(args.src, map_location="cpu", weights_only=False)
    sd = blob.get("network", blob.get("state_dict", blob)) if isinstance(blob, dict) else blob
    # strip DataParallel 'module.' prefixes (reference snapshots carry them)
    sd = { (k[7:] if k.startswith("module.") else k): v for k, v in sd.items() }

    if args.input_order == "auto":
        bgr = args.kind == "posenet"
    else:
        bgr = args.input_order == "bgr"
    if args.kind == "backbone":
        params, stats = convert_backbone(sd, args.resnet, bgr_input=bgr)
    else:
        params, stats = convert_posenet(sd, args.resnet, bgr_input=bgr)
    with open(args.dst, "wb") as f:
        f.write(serialization.to_bytes({"params": params, "batch_stats": stats}))
    print(f"wrote {args.dst}")


if __name__ == "__main__":
    main()
