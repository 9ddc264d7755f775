#!/usr/bin/env python
"""Measure the reference's CPU training throughput (the BASELINE.md anchor).

The reference publishes no numbers (BASELINE.md), so we measure its training
step empirically on CPU: the reference's own modules are imported read-only
from /root/reference (VisualEncoder, CrossAttentionFusion, CTCDecoder,
contrastive loss, trainer math at model/trainer.py:88-123) and driven with
synthetic batches of the same shapes our TPU bench uses.

The pretrained HF wav2vec2-large checkpoint cannot be downloaded here (no
egress), so the audio encoder is a *faithful-compute stand-in*: the same
architecture skeleton (wav2vec2-large dims: 7-layer conv feature extractor,
24 transformer layers, d=1024, ffn=4096) built from torch primitives and
randomly initialized.  Compute cost per step matches the real model; only the
weights differ, which does not change throughput.

Writes benchmarks/reference_cpu.json with utterances/sec.
"""

import json
import os
import sys
import time

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

sys.path.insert(0, "/root/reference")

# The reference imports torchvision but never uses it (dead import,
# reference model/encoder.py:3); stub it so the module loads without the dep.
import types

_tv = types.ModuleType("torchvision")
_tv.models = types.ModuleType("torchvision.models")
sys.modules.setdefault("torchvision", _tv)
sys.modules.setdefault("torchvision.models", _tv.models)
_hf = types.ModuleType("transformers")
class _NoHF:
    @staticmethod
    def from_pretrained(*a, **k):
        raise RuntimeError("no network access")
_hf.Wav2Vec2Model = _NoHF
sys.modules.setdefault("transformers", _hf)

BATCH = 8
VIDEO_FRAMES = 120          # 4 s at 30 fps
SAMPLES = VIDEO_FRAMES * 534
LABEL_LEN = 20
VOCAB = 800
BLANK = 3
STEPS = 2
torch.manual_seed(0)
torch.set_num_threads(os.cpu_count() or 8)


class Wav2Vec2LargeStandIn(nn.Module):
    """wav2vec2-large compute skeleton (conv extractor + 24×Transformer d=1024)."""

    def __init__(self):
        super().__init__()
        convs = []
        dims = [(1, 512, 10, 5)] + [(512, 512, 3, 2)] * 4 + [(512, 512, 2, 2)] * 2
        for cin, cout, k, s in dims:
            convs.append(nn.Conv1d(cin, cout, k, s))
            convs.append(nn.GELU())
        self.extractor = nn.Sequential(*convs)
        self.proj = nn.Linear(512, 1024)
        layer = nn.TransformerEncoderLayer(
            d_model=1024, nhead=16, dim_feedforward=4096, batch_first=True,
            activation="gelu",
        )
        self.layers = nn.ModuleList([layer for _ in range(1)])  # placeholder
        self.layers = nn.ModuleList(
            [nn.TransformerEncoderLayer(1024, 16, 4096, batch_first=True,
                                        activation="gelu") for _ in range(24)]
        )
        self.output_dim = 1024

    def forward(self, x, attention_mask=None):
        h = self.extractor(x.unsqueeze(1)).transpose(1, 2)   # [B, T', 512]
        h = self.proj(h)
        hiddens = []
        for layer in self.layers:
            h = layer(h)
            hiddens.append(h)
        middle = torch.stack(hiddens[6:10]).mean(0)
        return h, middle


def main():
    from model.encoder import VisualEncoder            # reference modules
    from model.fusion_module import CrossAttentionFusion
    from model.decoder import CTCDecoder
    from contrastive import contrastive_loss_with_mask

    visual = VisualEncoder()
    audio = Wav2Vec2LargeStandIn()
    fusion = CrossAttentionFusion(512, 1024, 512)
    decoder = CTCDecoder(1024, VOCAB, blank_id=BLANK)
    proj = nn.Linear(1024, 128)
    ctc = nn.CTCLoss(blank=BLANK, zero_infinity=True)
    params = (
        list(visual.parameters()) + list(audio.parameters())
        + list(fusion.parameters()) + list(decoder.parameters())
        + list(proj.parameters())
    )
    opt = torch.optim.Adam(params, lr=1e-4)
    n_params = sum(p.numel() for p in params)
    print(f"total params: {n_params/1e6:.1f}M")

    rng = np.random.default_rng(0)
    lip1 = torch.tensor(rng.uniform(size=(BATCH, 1, VIDEO_FRAMES, 96, 96)).astype(np.float32))
    lip2 = torch.tensor(rng.uniform(size=(BATCH, 1, VIDEO_FRAMES, 96, 96)).astype(np.float32))
    mixed = torch.tensor(rng.standard_normal((BATCH, SAMPLES)).astype(np.float32) * 0.1)
    mask1 = torch.tensor(rng.integers(0, 3, size=(BATCH, SAMPLES)))
    mask2 = torch.tensor(rng.integers(0, 3, size=(BATCH, SAMPLES)))
    text1 = torch.tensor(rng.integers(5, VOCAB, size=(BATCH, LABEL_LEN)))
    text2 = torch.tensor(rng.integers(5, VOCAB, size=(BATCH, LABEL_LEN)))
    tlen = torch.full((BATCH,), LABEL_LEN, dtype=torch.long)

    def step():
        opt.zero_grad()
        vf1 = visual(lip1)
        vf2 = visual(lip2)
        af1, am1 = audio(mixed, attention_mask=(mask1 != 3))
        af2, am2 = audio(mixed, attention_mask=(mask2 != 3))
        T_enc = af1.shape[1]
        m1 = F.interpolate(mask1.unsqueeze(1).float(), size=T_enc, mode="nearest").squeeze(1).long()
        m2 = F.interpolate(mask2.unsqueeze(1).float(), size=T_enc, mode="nearest").squeeze(1).long()
        c1 = contrastive_loss_with_mask(am1, m1.reshape(-1), projection_layer=proj)
        c2 = contrastive_loss_with_mask(am2, m2.reshape(-1), projection_layer=proj)
        f1, il1 = fusion(vf1, af1, mask=m1)
        f2, il2 = fusion(vf2, af2, mask=m2)
        lp1 = decoder(f1)
        lp2 = decoder(f2)
        l1 = ctc(lp1.transpose(0, 1), text1, il1, tlen)
        l2 = ctc(lp2.transpose(0, 1), text2, il2, tlen)
        loss = (l1 + l2) / 2 + 0.1 * (c1 + c2) / 2
        loss.backward()
        opt.step()
        return float(loss)

    step()  # warm up (allocator, thread pools)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        loss = step()
    dt = (time.perf_counter() - t0) / STEPS
    utt_per_sec = BATCH / dt
    audio_seconds = BATCH * SAMPLES / 16000
    result = {
        "sec_per_step": dt,
        "utterances_per_sec": utt_per_sec,
        "rtf": audio_seconds / dt,
        "batch": BATCH,
        "video_frames": VIDEO_FRAMES,
        "samples": SAMPLES,
        "params_m": n_params / 1e6,
        "loss": loss,
        "torch_threads": torch.get_num_threads(),
    }
    print(json.dumps(result))
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "reference_cpu.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
