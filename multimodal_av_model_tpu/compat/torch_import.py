"""Import reference torch checkpoints into this framework's parameter tree.

The reference saves checkpoints as a dict of per-module ``state_dict``s
(reference main.py:48-55: ``{'epoch', 'visual_encoder', 'audio_encoder',
'fusion', 'decoder1', 'optimizer'}``) plus bare visual-encoder snapshots
(reference main.py:95-97).  A user migrating from the reference brings those
files along; this module maps them weight-for-weight onto the flax trees of
``models/{visual,fusion,decoder}.py`` so trained reference models serve and
fine-tune here without retraining.

What maps, and how:

* ``visual_encoder`` → ``VisualEncoder``: the reference Conv3D frontend
  kernel ``[64, 1, 5, 7, 7]`` becomes our time-folded 2D kernel
  ``[7, 7, 5, 64]`` (tap k of the 3D kernel = input channel k of the folded
  conv — the exact reparametrization of models/visual.py:80-88); BatchNorms
  map weight/bias → scale/bias and running stats → ``batch_stats``; the
  ResNet trunk's ``layerS.B.{conv1,bn1,conv2,bn2,downsample,relu}`` map onto
  ``trunk/layer{S}_{B}/{Conv_0,BatchNorm_0,Conv_1,BatchNorm_1,Conv_2,
  BatchNorm_2,PReLU_*}``.  The reference BasicBlock applies ONE PReLU module
  at both activation sites (reference model/encoder.py:11,17-22); our block
  declares two, so the single torch alpha is copied into both — forward
  math is identical.
* ``fusion`` → ``CrossAttentionFusion``: Linears transpose; the torch
  ``nn.MultiheadAttention`` packed ``in_proj_weight [3E, E]`` splits into
  flax's per-head ``query/key/value`` kernels ``[E, H, hd]`` and the
  ``out_proj`` reshapes to ``[H, hd, E]``; the 2-layer bidirectional
  ``nn.LSTM`` maps gate-sliced (torch gate order i,f,g,o = flax's) onto
  ``temporal_bilstm/layer{i}/{fwd,bwd}``, with the two torch biases summed
  into the single flax h-side bias (they only ever appear added).
* ``decoder1`` → ``CTCDecoder``: ``net.0`` Linear transposed into ``head``.
* ``audio_encoder`` is SKIPPED, exactly as the reference's own
  ``load_checkpoint`` does (reference main.py:60-61 — the line restoring it
  is commented out): those weights are a HuggingFace wav2vec2 state_dict
  with no counterpart in our from-scratch Conformer.  ``optimizer`` state is
  torch Adam moments keyed by parameter id — meaningless across frameworks —
  and is skipped with a note.

CLI:
  python -m multimodal_av_model_tpu.compat.torch_import ckpt.pt out_dir/
loads the torch file (CPU), converts, and writes a checkpoint in our native
format (train/checkpoints.py) that ``--resume``/``--graft`` consume.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

# Torch gate order within the packed [4H, ...] LSTM weights
# (torch.nn.LSTM docs): input, forget, cell(g), output — the same order as
# flax's OptimizedLSTMCell children, which models/layers.py mirrors.
_GATES = "ifgo"


def _np(t) -> np.ndarray:
    """torch.Tensor | ndarray → float32 ndarray (no torch import needed)."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _linear(sd: Mapping[str, Any], prefix: str) -> dict:
    """torch ``nn.Linear`` → flax ``Dense`` (kernel = weight.T)."""
    out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _bn(sd: Mapping[str, Any], prefix: str) -> tuple[dict, dict]:
    """torch ``BatchNorm{2,3}d`` → (flax params, flax batch_stats)."""
    params = {"scale": _np(sd[f"{prefix}.weight"]),
              "bias": _np(sd[f"{prefix}.bias"])}
    stats = {"mean": _np(sd[f"{prefix}.running_mean"]),
             "var": _np(sd[f"{prefix}.running_var"])}
    return params, stats


def _conv2d(sd: Mapping[str, Any], key: str) -> dict:
    """torch Conv2d weight ``[O, I, kh, kw]`` → flax ``[kh, kw, I, O]``."""
    return {"kernel": _np(sd[key]).transpose(2, 3, 1, 0)}


def convert_visual_state_dict(sd: Mapping[str, Any]) -> tuple[dict, dict]:
    """Reference ``VisualEncoder.state_dict()`` → (params, batch_stats)
    subtrees for ``models/visual.py:VisualEncoder``.

    Accepts both the flat state_dict of a bare encoder snapshot (reference
    main.py:95-97) and the same keys inside a full checkpoint's
    ``visual_encoder`` entry.
    """
    params: dict = {}
    stats: dict = {}

    # Frontend: Conv3d [64, 1, 5, 7, 7] → folded [7, 7, 5, 64]; tap k reads
    # frame t+k-2 on both sides (torch pads time by 2; our fold concatenates
    # taps as input channels in the same order — models/visual.py:100-105).
    w3 = _np(sd["frontend3D.0.weight"])          # [O, 1, kt, kh, kw]
    if w3.shape[1] != 1:
        raise ValueError(f"expected C_in=1 frontend Conv3D, got {w3.shape}")
    params["frontend_conv"] = {
        "kernel": w3[:, 0].transpose(2, 3, 1, 0)  # [kh, kw, kt, O]
    }
    params["BatchNorm_0"], stats["BatchNorm_0"] = _bn(sd, "frontend3D.1")
    if "frontend3D.2.weight" in sd:               # PReLU (absent for relu)
        params["PReLU_0"] = {"alpha": _np(sd["frontend3D.2.weight"])}

    trunk_p: dict = {}
    trunk_s: dict = {}
    stage_blocks = {}
    for key in sd:
        if key.startswith("trunk.layer"):
            rest = key[len("trunk.layer"):].split(".")  # "S.B.conv1.weight"
            stage_blocks.setdefault(int(rest[0]), set()).add(int(rest[1]))
    for stage, blocks in sorted(stage_blocks.items()):
        for b in sorted(blocks):
            pre = f"trunk.layer{stage}.{b}"
            bp: dict = {}
            bs: dict = {}
            bp["Conv_0"] = _conv2d(sd, f"{pre}.conv1.weight")
            bp["BatchNorm_0"], bs["BatchNorm_0"] = _bn(sd, f"{pre}.bn1")
            bp["Conv_1"] = _conv2d(sd, f"{pre}.conv2.weight")
            bp["BatchNorm_1"], bs["BatchNorm_1"] = _bn(sd, f"{pre}.bn2")
            if f"{pre}.downsample.0.weight" in sd:
                bp["Conv_2"] = _conv2d(sd, f"{pre}.downsample.0.weight")
                bp["BatchNorm_2"], bs["BatchNorm_2"] = _bn(sd, f"{pre}.downsample.1")
            if f"{pre}.relu.weight" in sd:
                # One torch PReLU used at both sites → copy into both of ours.
                alpha = {"alpha": _np(sd[f"{pre}.relu.weight"])}
                bp["PReLU_0"] = alpha
                bp["PReLU_1"] = {"alpha": alpha["alpha"].copy()}
            name = f"layer{stage}_{b}"
            trunk_p[name] = bp
            trunk_s[name] = bs
    params["trunk"] = trunk_p
    stats["trunk"] = trunk_s
    return params, stats


def _mha(sd: Mapping[str, Any], prefix: str, num_heads: int) -> dict:
    """torch ``nn.MultiheadAttention`` (packed in_proj) → flax
    ``MultiHeadDotProductAttention`` params."""
    w_in = _np(sd[f"{prefix}.in_proj_weight"])    # [3E, E]
    b_in = _np(sd[f"{prefix}.in_proj_bias"])      # [3E]
    E = w_in.shape[1]
    if E % num_heads:
        raise ValueError(f"embed dim {E} not divisible by {num_heads} heads")
    hd = E // num_heads
    out: dict = {}
    for i, name in enumerate(("query", "key", "value")):
        w = w_in[i * E:(i + 1) * E]               # [E_out, E_in]
        b = b_in[i * E:(i + 1) * E]
        out[name] = {"kernel": w.T.reshape(E, num_heads, hd),
                     "bias": b.reshape(num_heads, hd)}
    wo = _np(sd[f"{prefix}.out_proj.weight"])     # [E, E]: y = h @ wo.T + bo
    out["out"] = {"kernel": wo.T.reshape(num_heads, hd, E),
                  "bias": _np(sd[f"{prefix}.out_proj.bias"])}
    return out


def _bilstm(sd: Mapping[str, Any], prefix: str, num_layers: int) -> dict:
    """torch ``nn.LSTM(bidirectional=True)`` → ``models/layers.py:BiLSTM``."""
    out: dict = {}
    for layer in range(num_layers):
        lp: dict = {}
        for direction, suffix in (("fwd", ""), ("bwd", "_reverse")):
            w_ih = _np(sd[f"{prefix}.weight_ih_l{layer}{suffix}"])  # [4H, in]
            w_hh = _np(sd[f"{prefix}.weight_hh_l{layer}{suffix}"])  # [4H, H]
            b_ih = _np(sd[f"{prefix}.bias_ih_l{layer}{suffix}"])
            b_hh = _np(sd[f"{prefix}.bias_hh_l{layer}{suffix}"])
            H = w_hh.shape[1]
            dp: dict = {}
            for g, c in enumerate(_GATES):
                rows = slice(g * H, (g + 1) * H)
                dp[f"i{c}"] = {"kernel": w_ih[rows].T}
                # flax keeps one bias (on the h-side); torch's two biases
                # only ever appear summed in the gate pre-activation.
                dp[f"h{c}"] = {"kernel": w_hh[rows].T,
                               "bias": b_ih[rows] + b_hh[rows]}
            lp[direction] = dp
        out[f"layer{layer}"] = lp
    return out


def convert_fusion_state_dict(
    sd: Mapping[str, Any], num_heads: int = 4, temporal_layers: int = 2
) -> dict:
    """Reference ``CrossAttentionFusion.state_dict()`` → params subtree for
    ``models/fusion.py:CrossAttentionFusion`` (temporal_model='bilstm').

    The reference's ``cross_attn_visual`` is declared but never applied
    (reference model/fusion_module.py:14,62) — its weights are dropped, as
    our module intentionally does not replicate the dead branch.
    """
    return {
        "visual_proj": _linear(sd, "visual_proj"),
        "audio_proj": _linear(sd, "audio_proj"),
        "cross_attn_audio": _mha(sd, "cross_attn_audio", num_heads),
        "fusion_proj": _linear(sd, "fusion_proj"),
        "temporal_bilstm": _bilstm(sd, "temporal_model", temporal_layers),
    }


def convert_decoder_state_dict(sd: Mapping[str, Any]) -> dict:
    """Reference ``CTCDecoder.state_dict()`` (``net.0`` Linear,
    reference model/decoder.py:8-10) → params for ``models/decoder.py``."""
    return {"head": _linear(sd, "net.0")}


def _tree_shapes_match(src, template, path=""):
    """Recursive shape check so a mismatched config fails loudly with the
    offending path instead of deep inside flax."""
    problems = []
    if isinstance(template, Mapping) or isinstance(src, Mapping):
        skeys = set(src) if isinstance(src, Mapping) else set()
        tkeys = set(template) if isinstance(template, Mapping) else set()
        for k in sorted(skeys | tkeys):
            if k not in skeys:
                problems.append(f"{path}/{k}: missing from imported tree")
            elif k not in tkeys:
                problems.append(f"{path}/{k}: not in model template")
            else:
                problems += _tree_shapes_match(src[k], template[k], f"{path}/{k}")
        return problems
    s, t = np.shape(src), np.shape(template)
    if s != t:
        problems.append(f"{path}: shape {s} != template {t}")
    return problems


def import_reference_checkpoint(
    ckpt: Mapping[str, Any],
    params: Mapping[str, Any],
    batch_stats: Mapping[str, Any] | None = None,
    num_heads: int = 4,
    temporal_layers: int = 2,
    strict: bool = True,
) -> tuple[dict, dict, dict]:
    """Merge a loaded reference checkpoint dict into copies of this model's
    ``params`` / ``batch_stats`` templates (``MultiSpeakerAVModel`` layout:
    top-level ``visual_encoder / fusion / decoder`` — av_model.py:63-66).

    ``ckpt`` is either the full reference save (keys per reference
    main.py:48-55) or a bare visual-encoder state_dict.  Returns
    ``(params, batch_stats, report)`` where ``report`` lists imported and
    skipped entries.  Entries NOT present in the checkpoint (audio encoder,
    contrastive projection) keep their template values.
    """
    params = dict(params)
    batch_stats = dict(batch_stats or {})
    report: dict = {"imported": [], "skipped": []}

    if "visual_encoder" not in ckpt and any(
        k.startswith("frontend3D") for k in ckpt
    ):
        ckpt = {"visual_encoder": ckpt}        # bare encoder snapshot

    def _merge(name: str, new_p, new_s=None):
        problems = _tree_shapes_match(new_p, params.get(name, {}), name)
        if new_s is not None and batch_stats.get(name) is not None:
            problems += _tree_shapes_match(new_s, batch_stats[name], name)
        if problems and strict:
            raise ValueError(
                f"imported '{name}' does not fit the model config:\n  "
                + "\n  ".join(problems[:20]))
        params[name] = new_p
        if new_s is not None and name in batch_stats:
            batch_stats[name] = new_s
        report["imported"].append(name)

    if "visual_encoder" in ckpt:
        vp, vs = convert_visual_state_dict(ckpt["visual_encoder"])
        _merge("visual_encoder", vp, vs)
    if "fusion" in ckpt:
        _merge("fusion", convert_fusion_state_dict(
            ckpt["fusion"], num_heads, temporal_layers))
    if "decoder1" in ckpt:
        _merge("decoder", convert_decoder_state_dict(ckpt["decoder1"]))
    if "audio_encoder" in ckpt:
        report["skipped"].append(
            "audio_encoder (HF wav2vec2 state — the reference's own loader "
            "skips restoring it too, reference main.py:60-61)")
    if "optimizer" in ckpt:
        report["skipped"].append(
            "optimizer (torch Adam moments, framework-specific)")
    for k in ckpt:
        if k not in ("visual_encoder", "fusion", "decoder1", "audio_encoder",
                     "optimizer", "epoch") and not k.startswith("frontend3D"):
            report["skipped"].append(k)
    return params, batch_stats, report


def _main(argv) -> int:
    import jax
    import torch

    from ..config import Config
    from ..models import MultiSpeakerAVModel
    from ..train.checkpoints import save_checkpoint

    if len(argv) < 2:
        print("usage: python -m multimodal_av_model_tpu.compat.torch_import "
              "<reference_ckpt.pt> <out.ckpt> [vocab_size]")
        return 2
    src, out_path = argv[0], argv[1]
    cfg = Config()
    if len(argv) > 2:
        cfg.model.decoder.vocab_size = int(argv[2])

    ckpt = torch.load(src, map_location="cpu", weights_only=True)
    model = MultiSpeakerAVModel(cfg.model)
    # Template init on tiny tracing shapes — parameter shapes are
    # time/batch-independent, so 2 frames is enough to materialize the tree.
    B, T, S = 1, 2, 2 * 534
    variables = model.init(
        jax.random.PRNGKey(0),
        np.zeros((B, T, 1, 96, 96), np.float32),
        np.zeros((B, T, 1, 96, 96), np.float32),
        np.zeros((B, S), np.float32),
        np.zeros((B, S), np.int32),
        np.zeros((B, S), np.int32),
    )
    params, stats, report = import_reference_checkpoint(
        ckpt, variables["params"], variables.get("batch_stats"),
        num_heads=cfg.model.fusion.num_heads,
        temporal_layers=cfg.model.fusion.temporal_layers)
    epoch = int(ckpt.get("epoch", 0)) if hasattr(ckpt, "get") else 0
    # Same payload layout as the trainer's own saves (main.py:246), so
    # --resume / --graft / graft_subtree consume the file unchanged.
    save_checkpoint(out_path, {
        "state": {"params": params, "batch_stats": stats}, "epoch": epoch,
    })
    print(f"imported: {report['imported']} -> {out_path}")
    for s in report["skipped"]:
        print(f"skipped: {s}")
    return 0


if __name__ == "__main__":
    import sys

    raise SystemExit(_main(sys.argv[1:]))
