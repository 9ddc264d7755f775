"""Dress rehearsals of the production paths the bundled metadata-only corpus
cannot exercise (VERDICT r1 missing #3, #2b/#10):

* the NON-synthetic `main.py` branch end to end on a miniature on-disk
  AI-Hub-style corpus: manifest → validate → speaker-distinct pair sampling →
  bucketed training → eval → checkpoint → resume (reference main.py:66-203);
* the pretrained-visual-trunk recipe: visual-only CTC pretrain →
  graft into the flagship → frozen-trunk finetune (reference main.py:94-103).
"""

import os

import numpy as np
import pytest

from multimodal_av_model_tpu.data.synth_corpus import write_synthetic_corpus
from multimodal_av_model_tpu.main import main
from multimodal_av_model_tpu.text import CharTokenizer
from multimodal_av_model_tpu.train.checkpoints import restore_checkpoint

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
VOCAB = os.path.join(REPO_ROOT, "assets", "tokenizer800.vocab")

TINY_MODEL_ARGS = [
    "model.audio.d_model=32", "model.audio.num_layers=2", "model.audio.num_heads=2",
    "model.audio.ffn_dim=64", "model.audio.conv_kernel_size=7",
    "model.audio.middle_layers=(0,1)", "model.audio.output_dim=48",
    "model.visual.frontend_channels=8", "model.visual.resnet_layers=(1,1,1,1)",
    "model.visual.resnet_channels=(8,12,16,24)", "model.visual.output_dim=24",
    "model.fusion.fused_dim=16", "model.fusion.num_heads=2",
    "model.contrastive.projection_dim=8",
    "model.dtype=float32",
    f"data.vocab_path={VOCAB}",
]


@pytest.mark.slow
@pytest.mark.parametrize("device_preprocess", ["true", "false"])
def test_real_data_av_end_to_end(tmp_path, capsys, device_preprocess):
    """`python main.py` (no --synthetic) on a synthesized on-disk corpus:
    the full real-data branch including resume — both the on-device
    preprocessing path (production default) and the host path."""
    tok = CharTokenizer(VOCAB)
    # 35 entries over 5 speakers: the seeded 90/5/5 split then yields a val
    # set of 2 (the fixed eval pairs need two speaker-distinct entries).
    dirs = write_synthetic_corpus(str(tmp_path / "corpus"), tok,
                                  n_videos=5, sentences_per_video=7)
    ckpt_dir = str(tmp_path / "ckpt")
    args = TINY_MODEL_ARGS + [
        f"data.json_folder={dirs['json_folder']}",
        f"data.npy_dir={dirs['npy_dir']}",
        f"data.text_dir={dirs['text_dir']}",
        f"data.wav_dir={dirs['wav_dir']}",
        "data.video_buckets=(32,)",
        f"data.device_preprocess={device_preprocess}",
        "data.num_pairs_per_epoch=4", "data.eval_pairs=2",
        "train.batch_size=2", "train.eval_batch_size=2",
        "train.max_epochs=1", "train.log_every=100",
        f"train.checkpoint_dir={ckpt_dir}",
    ]
    main(args)
    assert os.path.isfile(os.path.join(ckpt_dir, "last.ckpt"))
    assert os.path.isfile(os.path.join(ckpt_dir, "eval_log.csv"))
    capsys.readouterr()

    # Second invocation resumes from last.ckpt and trains epoch 2.
    args2 = [a if not a.startswith("train.max_epochs") else "train.max_epochs=2"
             for a in args]
    main(args2)
    out = capsys.readouterr().out
    assert "resuming from" in out
    last = restore_checkpoint(os.path.join(ckpt_dir, "last.ckpt"))
    assert int(last["epoch"]) == 2

    # Serving surface over the same checkpoint dir + eval split.
    main(args + ["--infer"])
    out = capsys.readouterr().out
    assert "speaker1:" in out and "transcribed" in out

    # Metrics surface: --eval prints a scriptable JSON report with both
    # greedy and production-decode WER/CER from the same checkpoint.
    import json

    main(args + ["--eval"])
    out = capsys.readouterr().out
    report = json.loads(out.strip().splitlines()[-1])
    # --eval prefers best_wer.ckpt, which may be either epoch.
    assert report["epoch"] in (1, 2) and "greedy" in report["decode"]
    assert report["checkpoint"].endswith("best_wer.ckpt")
    assert "prefix_beam" in report["decode"]
    for algo in report["decode"].values():
        assert 0.0 <= algo["cer"] and 0.0 <= algo["wer"]
        assert "eval_loss" in algo


@pytest.mark.slow
def test_ssl_pretrain_graft_finetune(tmp_path, capsys):
    """The wav2vec2-substitute workflow at the CLI surface: --family=ssl
    pretrain → audio_init_ckpt graft + partial unfreeze finetune (the
    reference's pretrained-wav2vec2 load + unfreeze_middle_layers,
    model/encoder.py:83, main.py:26-31)."""
    ssl_dir = str(tmp_path / "ssl_ckpt")
    common_small = [
        "data.num_pairs_per_epoch=4", "data.eval_pairs=2",
        "train.batch_size=2", "train.eval_batch_size=2",
        "train.max_epochs=1", "train.log_every=100",
        "data.video_buckets=(32,)",
    ]
    main(["--family=ssl", "--synthetic",
          f"train.checkpoint_dir={ssl_dir}"] + common_small + TINY_MODEL_ARGS)
    ssl_ckpt = os.path.join(ssl_dir, "last.ckpt")
    assert os.path.isfile(ssl_ckpt)
    src = restore_checkpoint(ssl_ckpt)["state"]["params"]
    assert "audio_encoder" in src and "mask_embedding" in src["audio_encoder"]

    av_dir = str(tmp_path / "av_ckpt")
    capsys.readouterr()
    main(["--synthetic",
          f"train.audio_init_ckpt={ssl_ckpt}",
          "train.audio_trainable_layers=(1,)",
          f"train.checkpoint_dir={av_dir}"] + common_small + TINY_MODEL_ARGS)
    out = capsys.readouterr().out
    assert "grafted audio encoder" in out
    assert os.path.isfile(os.path.join(av_dir, "last.ckpt"))


@pytest.mark.slow
@pytest.mark.parametrize("family", ["audio", "visual"])
def test_single_modality_eval_and_infer_cli(tmp_path, capsys, family):
    """`--eval` / `--infer` on the audio/visual families (VERDICT r3 weak #6:
    they were flagship-only, so SSL→finetune products could not be scored
    from the CLI).  Train one tiny epoch, then score the checkpoint with
    greedy + production decode (JSON line) and serve transcripts."""
    import json

    ckpt_dir = str(tmp_path / f"{family}_ckpt")
    args = [f"--family={family}", "--synthetic",
            "data.num_pairs_per_epoch=4", "data.eval_pairs=2",
            "train.batch_size=2", "train.eval_batch_size=2",
            "train.max_epochs=1", "train.log_every=100",
            f"train.checkpoint_dir={ckpt_dir}"] + TINY_MODEL_ARGS
    main(args)
    assert os.path.isfile(os.path.join(ckpt_dir, "last.ckpt"))
    capsys.readouterr()

    main(args + ["--eval"])
    out = capsys.readouterr().out
    report = json.loads(out.strip().splitlines()[-1])
    assert report["family"] == family
    assert "greedy" in report["decode"] and "prefix_beam" in report["decode"]
    for algo in report["decode"].values():
        assert 0.0 <= algo["cer"] and 0.0 <= algo["wer"]
        assert "eval_loss" in algo

    main(args + ["--infer"])
    out = capsys.readouterr().out
    assert "[utt 0]" in out and "transcribed" in out


@pytest.mark.slow
def test_visual_pretrain_graft_freeze_finetune(tmp_path, capsys):
    """The recipe: --family=visual pretrain → visual_init_ckpt graft +
    freeze_visual_trunk finetune.  The finetuned flagship must carry the
    pretrained visual params UNCHANGED (frozen)."""
    vis_dir = str(tmp_path / "vis_ckpt")
    common_small = [
        "data.num_pairs_per_epoch=4", "data.eval_pairs=2",
        "train.batch_size=2", "train.eval_batch_size=2",
        "train.max_epochs=1", "train.log_every=100",
    ]
    main(["--family=visual", "--synthetic",
          f"train.checkpoint_dir={vis_dir}"] + common_small + TINY_MODEL_ARGS)
    vis_ckpt = os.path.join(vis_dir, "last.ckpt")
    assert os.path.isfile(vis_ckpt)
    pretrained = restore_checkpoint(vis_ckpt)["state"]["params"]["visual_encoder"]

    av_dir = str(tmp_path / "av_ckpt")
    capsys.readouterr()
    main(["--synthetic",
          f"train.visual_init_ckpt={vis_ckpt}",
          "train.freeze_visual_trunk=true",
          f"train.checkpoint_dir={av_dir}",
          "data.video_buckets=(32,)"] + common_small + TINY_MODEL_ARGS)
    out = capsys.readouterr().out
    assert "grafted visual encoder" in out

    final = restore_checkpoint(os.path.join(av_dir, "last.ckpt"))
    final_vis = final["state"]["params"]["visual_encoder"]

    def flat(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out.update(flat(v, f"{prefix}/{k}"))
            else:
                out[f"{prefix}/{k}"] = np.asarray(v)
        return out

    f_pre, f_fin = flat(pretrained), flat(final_vis)
    assert f_pre.keys() == f_fin.keys()
    for k in f_pre:
        np.testing.assert_array_equal(f_pre[k], f_fin[k], err_msg=k)
