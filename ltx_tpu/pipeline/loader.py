"""Assemble an LTXPipeline from downloaded weights.

TPU equivalent of the reference's loadModels phase
(reference: Sources/LTXVideo/Pipeline/LTXPipeline.swift:217-357): download ->
split unified file -> key-map each component -> optional quantization ->
optional LoRA fusion -> tokenizer.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Optional

import jax.numpy as jnp

from ltx_tpu.core.config import (
    LTXModel,
    MemoryConfig,
    QuantizationConfig,
    TransformerConfig,
)
from ltx_tpu.models import gemma3, text_encoder, vae
from ltx_tpu.pipeline.generate import LTXPipeline
from ltx_tpu.weights import keymaps
from ltx_tpu.weights.download import (
    download_all_components,
    load_safetensors,
    load_safetensors_dir,
)

log = logging.getLogger("ltx_tpu")


def load_tokenizer(gemma_dir):
    """Gemma SentencePiece tokenizer via HF `tokenizers`
    (reference: LTXPipeline.swift:254, swift-transformers AutoTokenizer)."""
    from tokenizers import Tokenizer

    from ltx_tpu.core.errors import FileNotFoundLTXError

    path = Path(gemma_dir) / "tokenizer.json"
    if not path.exists():
        raise FileNotFoundLTXError(f"tokenizer.json in {gemma_dir}")
    return Tokenizer.from_file(str(path))


def _quant_signature(component: str, quantization, layers: int,
                     audio: bool = False, lora_path=None,
                     lora_scale: float = 1.0) -> dict:
    """Staleness key for a quantized-weight cache entry: everything that
    changes the quantized tree besides the source file itself (which
    qcache records separately)."""
    sig = {
        "component": component,
        "mode": quantization.mode,
        "group": quantization.group_size,
        "layers": layers,
        "audio": audio,
    }
    if lora_path is not None:
        import os

        st = os.stat(lora_path)
        sig["lora"] = (f"{os.path.basename(str(lora_path))}:"
                       f"{st.st_size}:{st.st_mtime_ns}:{lora_scale}")
    return sig


def load_pipeline(
    model: LTXModel = LTXModel.DISTILLED,
    models_dir: Optional[str] = None,
    hf_token: Optional[str] = None,
    gemma_path: Optional[str] = None,
    unified_weights_path: Optional[str] = None,
    quantization: QuantizationConfig = QuantizationConfig(),
    memory: MemoryConfig = MemoryConfig(),
    lora_path: Optional[str] = None,
    lora_scale: float = 1.0,
    distilled_lora: bool = False,
    include_audio: bool = False,
    include_upscaler: bool = False,
    gemma_quant: str = "w8a8",
    gemma_embed_int8: bool = False,
    quant_cache: bool = True,
    transformer_config: Optional[TransformerConfig] = None,
    vae_config=None,
    text_encoder_config=None,
) -> LTXPipeline:
    """Download (if needed), load and assemble all components.

    quant_cache=True persists each quantized host tree next to its source
    checkpoint the first time (weights/qcache.py) so later loads mmap it
    back instead of re-running load-time transpose+quantization (~45 s for
    the int4 DiT, ~3 min for the w8a8 Gemma repack — BENCH_NOTES §13).
    Staleness keys: source file size+mtime + the full quant/LoRA signature.

    The *_config overrides exist for synthetic tiny end-to-end tests
    (tests/test_load_pipeline_e2e.py) — production always uses the real
    model constants.
    """
    tcfg = transformer_config or TransformerConfig()

    paths = download_all_components(
        model, models_dir=models_dir, hf_token=hf_token,
        include_audio=include_audio, include_upscaler=include_upscaler,
    )
    unified_path = unified_weights_path or paths["unified"]
    gemma_dir = gemma_path or paths["gemma"]

    log.info("Loading unified weights: %s", unified_path)
    tensors = load_safetensors(unified_path)
    tr_raw, vae_raw, conn_raw = keymaps.split_unified(
        tensors, include_audio=include_audio
    )
    del tensors

    # Standalone-file fallbacks (reference downloads connector + VAE as
    # separate files and its text-encoder key map supports both formats,
    # ModelDownloader.swift:283-301, 912-967): if the unified split yielded
    # no VAE / connector keys, read them from the standalone files.
    if not any("conv_in" in k for k in vae_raw) and paths.get("vae"):
        log.info("unified file has no VAE keys; loading standalone %s",
                 paths["vae"])
        vae_raw = load_safetensors(paths["vae"])
    if not conn_raw and paths.get("connector"):
        log.info("unified file has no connector keys; loading standalone %s",
                 paths["connector"])
        conn_raw = load_safetensors(paths["connector"])

    # --- transformer (quantized runs check the qcache first: a hit skips
    # the bf16 keymap/transpose, LoRA fusion AND quantization entirely)
    fuse_path = (lora_path or paths.get("distilled_lora")
                 if (distilled_lora or lora_path) else None)
    dit_params = None
    dit_sig = None
    if quantization.bits is not None:
        # audio pinned False: the cached video-DiT tree is identical either
        # way (extraction always runs include_audio=False below), so keying
        # on the flag would spuriously re-quantize ~45 s on --audio toggles
        dit_sig = _quant_signature(
            "dit", quantization, tcfg.num_layers,
            audio=False, lora_path=fuse_path, lora_scale=lora_scale)
        if quant_cache:
            from ltx_tpu.weights import qcache

            dit_params = qcache.load_quantized_tree(
                unified_path, f"dit-{quantization.mode}", dit_sig)
    if dit_params is None:
        # the VIDEO model never wants the dual checkpoint's audio keys:
        # include_audio=False drops them (plus the dual-only learnable
        # norm1/2/3 — a bug the file-to-frames e2e caught: passing True
        # here fed audio block keys into the video assembler)
        dit_params = keymaps.load_transformer_params(
            {k: v for k, v in tr_raw.items()}, tcfg.num_layers,
            include_audio=False,
        )
        del tr_raw

        # --- LoRA fusion (before quantization: merge in bf16)
        if fuse_path is not None:
            from ltx_tpu.lora.fuse import fuse_lora_file

            log.info("Fusing LoRA: %s (scale %.2f)", fuse_path, lora_scale)
            dit_params = fuse_lora_file(dit_params, fuse_path,
                                        scale=lora_scale,
                                        num_layers=tcfg.num_layers)

        # --- quantization (reference: LTXPipeline.swift:323-333)
        if quantization.bits is not None:
            from ltx_tpu.kernels.quantization import quantize_dit_params

            log.info("Quantizing transformer to int%d (group %d)",
                     quantization.bits, quantization.group_size)
            dit_params = quantize_dit_params(
                dit_params, quantization.bits, quantization.group_size,
                w8a8=quantization.mode == "w8a8",
            )
            if quant_cache:
                from ltx_tpu.weights import qcache

                qcache.save_quantized_tree(
                    dit_params, unified_path,
                    f"dit-{quantization.mode}", dit_sig)
    else:
        del tr_raw

    # --- VAE decoder (+ config flag)
    vcfg = vae_config or vae.VAEConfig()
    cfg_path = paths.get("vae_config")
    if cfg_path and Path(cfg_path).exists():
        with open(cfg_path) as f:
            vae_json = json.load(f)
        if vae_json.get("timestep_conditioning"):
            import dataclasses

            vcfg = dataclasses.replace(vcfg, timestep_conditioning=True)
    vae_dec = keymaps.load_vae_decoder_params(vae_raw)
    vae_enc = None
    if any(k.startswith("encoder.") for k in vae_raw):
        vae_enc = keymaps.load_vae_encoder_params(vae_raw)
    elif paths.get("vae") and Path(paths["vae"]).exists():
        # encoder weights ship ONLY in the standalone VAE file (the unified
        # split keeps decoder keys; reference: ModelDownloader.swift:1196-1212)
        standalone = load_safetensors(paths["vae"])
        if any(k.startswith("encoder.") for k in standalone):
            vae_enc = keymaps.load_vae_encoder_params(standalone)
        del standalone
    del vae_raw

    # --- text encoder stack
    te_params = keymaps.load_text_encoder_params(conn_raw)
    del conn_raw
    gcfg_path = Path(gemma_dir) / "config.json"
    with open(gcfg_path) as f:
        gcfg = gemma3.Gemma3Config.from_hf_dict(json.load(f))
    gemma_tensors = load_safetensors_dir(gemma_dir)
    # w8a8 (per-channel int8, MXU dot) is the default: ~6x faster decode
    # than the fused-int4 path for prompt enhancement, ~11.5 GB resident
    # during the text phases (freed before the DiT under phase staging)
    gemma_params = None
    gemma_sig = {"component": "gemma", "mode": gemma_quant,
                 "layers": gcfg.hidden_layers,
                 "embed_int8": gemma_embed_int8}
    if quant_cache and gemma_quant != "bf16":
        from ltx_tpu.weights import qcache

        gemma_params = qcache.load_quantized_tree(
            gemma_dir, f"gemma-{gemma_quant}", gemma_sig)
    if gemma_params is None:
        gemma_params = keymaps.load_gemma_params(
            gemma_tensors, gcfg.hidden_layers, mode=gemma_quant,
            embed_int8=gemma_embed_int8)
        if quant_cache and gemma_quant != "bf16":
            from ltx_tpu.weights import qcache

            qcache.save_quantized_tree(gemma_params, gemma_dir,
                                       f"gemma-{gemma_quant}", gemma_sig)

    # SigLIP vision tower for I2V prompt enhancement (present in the VLM
    # export the reference uses; None for text-only checkpoints)
    from ltx_tpu.models import siglip

    vision_params = siglip.load_vision_params(gemma_tensors)
    vision_config = siglip.SigLIPConfig() if vision_params is not None else None
    if vision_params is None:
        log.info("no vision tower in %s: I2V prompt enhancement will run "
                 "text-only", gemma_dir)
    del gemma_tensors

    tokenizer = load_tokenizer(gemma_dir)

    # --- optional components
    extras = {}
    if include_upscaler and "upscaler" in paths:
        from ltx_tpu.models import upscaler as upscaler_mod

        extras["upscaler_params"] = upscaler_mod.load_params(
            load_safetensors(paths["upscaler"]))
        extras["upscaler_config"] = upscaler_mod.UpscalerConfig()
    if include_audio:
        from ltx_tpu.models import audio_vae as av_mod

        if "audio_vae" in paths:
            extras["audio_vae_params"] = av_mod.load_audio_vae_params(
                load_safetensors(paths["audio_vae"]))
            extras["audio_vae_config"] = av_mod.AudioVAEConfig()
        if "vocoder" in paths:
            extras["vocoder_params"] = av_mod.load_vocoder_params(
                load_safetensors(paths["vocoder"]))
            extras["vocoder_config"] = av_mod.VocoderConfig()
        # dual AV transformer: re-split the unified file with audio keys
        av_params = None
        av_sig = None
        if quantization.bits is not None:
            av_sig = _quant_signature("av", quantization, tcfg.num_layers)
            if quant_cache:
                from ltx_tpu.weights import qcache

                av_params = qcache.load_quantized_tree(
                    unified_path, f"av-{quantization.mode}", av_sig)
        if av_params is None:
            tensors2 = load_safetensors(unified_path)
            av_params = keymaps.load_av_transformer_params(
                tensors2, tcfg.num_layers)
            del tensors2
            if quantization.bits is not None:
                # 19B + audio stream cannot fit one chip's ~15.5 GB HBM in
                # bf16; the generic walker quantizes all 6 attentions +
                # 2 FFNs per dual block (VERDICT r1 weak #2).
                from ltx_tpu.kernels.quantization import (
                    quantize_transformer_params,
                )

                log.info("Quantizing AV transformer to int%d (group %d)",
                         quantization.bits, quantization.group_size)
                av_params = quantize_transformer_params(
                    av_params, quantization.bits, quantization.group_size,
                    w8a8=quantization.mode == "w8a8")
                if quant_cache:
                    from ltx_tpu.weights import qcache

                    qcache.save_quantized_tree(
                        av_params, unified_path,
                        f"av-{quantization.mode}", av_sig)
        extras["av_transformer_params"] = av_params

    return LTXPipeline(
        **extras,
        transformer_params=dit_params,
        transformer_config=tcfg,
        vae_decoder_params=vae_dec,
        vae_config=vcfg,
        gemma_params=gemma_params,
        gemma_config=gcfg,
        text_encoder_params=te_params,
        text_encoder_config=(text_encoder_config
                             or text_encoder.TextEncoderConfig()),
        tokenizer=tokenizer,
        vae_encoder_params=vae_enc,
        memory=memory,
        is_distilled=(model.is_distilled or distilled_lora),
        vision_params=vision_params,
        vision_config=vision_config,
    )
