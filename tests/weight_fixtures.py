"""Independently-transcribed checkpoint key inventories for every component.

This module is the OFFLINE weight contract: each `*_spec()` function
enumerates the exact source-checkpoint key set (with shapes) a component's
safetensors file carries, transcribed DIRECTLY from the reference's Swift
module definitions and key-map tables — NOT from this repo's loaders. A
loader and this transcription were written against the same Swift source
independently; `tests/test_weight_contract.py` asserts they agree: every
spec key is consumed, nothing is left over, and the mapped shapes match.

Spec values are plain shape tuples (so real-scale specs cost nothing);
`materialize()` turns a spec into numpy tensors for actually running a
loader (use scaled-down dims — key STRUCTURE, incl. real layer counts,
stays identical, so key-count assertions hold at any dim scale).

Transcription sources (file:line refs are into /root/reference):
  - video DiT:   Sources/LTXVideo/Models/Transformer/LTXTransformer.swift:34-101,
                 LTXTransformerBlock.swift:109-114, LTXAttention.swift:122-157,
                 LTXFeedForward.swift:19-44, LTXTimestepEmbedding.swift:62-144,
                 key map ModelDownloader.swift:756-803
  - AV DiT:      LTX2Transformer.swift:29-120, LTX2TransformerBlock.swift:71-169
  - VAE decoder: VideoDecoder.swift:37-356, key map ModelDownloader.swift:808-899
  - VAE encoder: VideoEncoder.swift:71-262, key map ModelDownloader.swift:1222-1285
  - connector:   LTXTextEncoder.swift:127-420, key map ModelDownloader.swift:912-967
  - audio VAE:   AudioVAE.swift:37-383 (sanitize :466-481)
  - vocoder:     Vocoder.swift:17-215 (sanitize :272-312)
  - upscaler:    SpatialUpscaler.swift:15-258 (sanitize :288-312)
  - Gemma-3:     Gemma3Config.swift:44-57, Gemma3Model.swift:347-370
  - unified split: ModelDownloader.swift:1343-1399
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

Spec = Dict[str, Tuple[int, ...]]


# ---------------------------------------------------------------------------
# Video DiT (unified-file / Diffusers spellings — the INPUT side of
# mapTransformerKey, ModelDownloader.swift:756-803)
# ---------------------------------------------------------------------------


def _linear(spec: Spec, key: str, d_in: int, d_out: int, bias: bool = True):
    """torch Linear checkpoint layout: weight (out, in), bias (out,)."""
    spec[f"{key}.weight"] = (d_out, d_in)
    if bias:
        spec[f"{key}.bias"] = (d_out,)


def _attention(spec: Spec, prefix: str, q_dim: int, kv_dim: int,
               inner: int) -> None:
    """LTXAttention (LTXAttention.swift:122-157): to_q/to_k/to_v/to_out all
    biased; q_norm/k_norm are RMSNorm over the full inner dim. Checkpoint
    spellings use Diffusers norm_q/norm_k and indexed to_out.0
    (ModelDownloader.swift:791-795)."""
    _linear(spec, f"{prefix}.to_q", q_dim, inner)
    _linear(spec, f"{prefix}.to_k", kv_dim, inner)
    _linear(spec, f"{prefix}.to_v", kv_dim, inner)
    _linear(spec, f"{prefix}.to_out.0", inner, q_dim)
    spec[f"{prefix}.norm_q.weight"] = (inner,)
    spec[f"{prefix}.norm_k.weight"] = (inner,)


def _ffn(spec: Spec, prefix: str, dim: int, mult: int = 4) -> None:
    """LTXFeedForward (LTXFeedForward.swift:35-44): GELU proj_in + proj_out,
    Diffusers spellings ff.net.0.proj / ff.net.2
    (ModelDownloader.swift:799-800)."""
    _linear(spec, f"{prefix}.net.0.proj", dim, dim * mult)
    _linear(spec, f"{prefix}.net.2", dim * mult, dim)


def _adaln_single(spec: Spec, prefix: str, dim: int, num_embeddings: int,
                  emb_nested: bool = True) -> None:
    """AdaLayerNormSingle (LTXTimestepEmbedding.swift:62-110): TimestepMLP
    (256->dim->dim) + linear (dim -> num_embeddings*dim). Checkpoint nests
    the MLP as .emb.timestep_embedder. which the map flattens to .emb.
    (ModelDownloader.swift:786-788)."""
    emb = f"{prefix}.emb.timestep_embedder" if emb_nested else f"{prefix}.emb"
    _linear(spec, f"{emb}.linear_1", 256, dim)
    _linear(spec, f"{emb}.linear_2", dim, dim)
    _linear(spec, f"{prefix}.linear", dim, num_embeddings * dim)


def video_transformer_spec(num_layers: int = 48, inner: int = 4096,
                           in_channels: int = 128, out_channels: int = 128,
                           cross_dim: int = 4096,
                           caption_dim: int = 3840) -> Spec:
    """Unified-file video-DiT keys, post `model.diffusion_model.` strip.

    Defaults are the real 19B config (LTXConfig.swift:123-129: 48 layers,
    32 heads x 128, in/out 128, cross 4096, caption 3840).
    15 top-level + 25/block keys.
    """
    spec: Spec = {}
    # LTXTransformer.swift:34-50 module keys; Diffusers input spellings per
    # ModelDownloader.swift:773-784 (proj_in -> patchify_proj,
    # time_embed -> adaln_single).
    _linear(spec, "proj_in", in_channels, inner)
    _adaln_single(spec, "time_embed", inner, 6)
    _linear(spec, "caption_projection.linear_1", caption_dim, inner)
    _linear(spec, "caption_projection.linear_2", inner, inner)
    _linear(spec, "proj_out", inner, out_channels)
    spec["scale_shift_table"] = (2, inner)  # LTXTransformer.swift:101

    for i in range(num_layers):
        p = f"transformer_blocks.{i}"
        # LTXTransformerBlock.swift:109-114: attn1/attn2/ff/SST only —
        # norm1..3 are affine-free (no checkpoint keys).
        _attention(spec, f"{p}.attn1", inner, inner, inner)
        _attention(spec, f"{p}.attn2", inner, cross_dim, inner)
        _ffn(spec, f"{p}.ff", inner)
        spec[f"{p}.scale_shift_table"] = (6, inner)
    return spec


def av_transformer_spec(num_layers: int = 48, inner: int = 4096,
                        audio_inner: int = 2048, in_channels: int = 128,
                        out_channels: int = 128, cross_dim: int = 4096,
                        caption_dim: int = 3840, audio_in: int = 128,
                        audio_out: int = 128) -> Spec:
    """Unified-AV-file dual DiT keys, post `model.diffusion_model.` strip.

    Audio top-level spellings RESOLVED from the Swift module keys
    (LTX2Transformer.swift:37-48): `audio_patchify_proj`,
    `audio_adaln_single`, `audio_caption_projection`, `audio_proj_out`,
    `av_ca_{video,audio}_scale_shift_adaln_single`,
    `av_ca_{a2v,v2a}_gate_adaln_single` — mapTransformerKey leaves audio
    keys untouched except the generic .emb.timestep_embedder. flatten
    (ModelDownloader.swift:786-788), and unmatched keys are DROPPED by
    applyTransformerWeights, so a working checkpoint must carry exactly
    these spellings. audioInnerDim = 32 x 64 = 2048,
    audioCrossAttentionDim = audioInnerDim (LTXConfig.swift:134-171).
    54 top-level + 80/block keys.
    """
    spec = video_transformer_spec(0, inner, in_channels, out_channels,
                                  cross_dim, caption_dim)
    # --- audio top level (LTX2Transformer.swift:37-48, 83-104)
    _linear(spec, "audio_patchify_proj", audio_in, audio_inner)
    _adaln_single(spec, "audio_adaln_single", audio_inner, 6)
    _linear(spec, "audio_caption_projection.linear_1", caption_dim,
            audio_inner)
    _linear(spec, "audio_caption_projection.linear_2", audio_inner,
            audio_inner)
    _linear(spec, "audio_proj_out", audio_inner, audio_out)
    spec["audio_scale_shift_table"] = (2, audio_inner)
    # cross-modal AdaLN singles: numEmbeddings 4 (scale/shift) and 1 (gate)
    _adaln_single(spec, "av_ca_video_scale_shift_adaln_single", inner, 4)
    _adaln_single(spec, "av_ca_a2v_gate_adaln_single", inner, 1)
    _adaln_single(spec, "av_ca_audio_scale_shift_adaln_single", audio_inner, 4)
    _adaln_single(spec, "av_ca_v2a_gate_adaln_single", audio_inner, 1)

    for i in range(num_layers):
        p = f"transformer_blocks.{i}"
        # LTX2TransformerBlock.swift:71-96: learnable RMSNorms + dual
        # attn/ff stacks + 2 cross-modal attentions + 4 SSTs.
        spec[f"{p}.norm1.weight"] = (inner,)
        _attention(spec, f"{p}.attn1", inner, inner, inner)
        spec[f"{p}.norm2.weight"] = (inner,)
        _attention(spec, f"{p}.attn2", inner, cross_dim, inner)
        spec[f"{p}.norm3.weight"] = (inner,)
        _ffn(spec, f"{p}.ff", inner)
        spec[f"{p}.scale_shift_table"] = (6, inner)

        spec[f"{p}.audio_norm1.weight"] = (audio_inner,)
        _attention(spec, f"{p}.audio_attn1", audio_inner, audio_inner,
                   audio_inner)
        spec[f"{p}.audio_norm2.weight"] = (audio_inner,)
        # audio text cross-attn: kv from audioCrossAttentionDim == audio_inner
        _attention(spec, f"{p}.audio_attn2", audio_inner, audio_inner,
                   audio_inner)
        spec[f"{p}.audio_norm3.weight"] = (audio_inner,)
        _ffn(spec, f"{p}.audio_ff", audio_inner)
        spec[f"{p}.audio_scale_shift_table"] = (6, audio_inner)

        # A2V: Q video-dim, KV audio-dim, audio head count/dim
        # (LTX2TransformerBlock.swift:150-163)
        spec[f"{p}.audio_to_video_norm.weight"] = (inner,)
        _attention(spec, f"{p}.audio_to_video_attn", inner, audio_inner,
                   audio_inner)
        # V2A: Q audio-dim, KV video-dim
        spec[f"{p}.video_to_audio_norm.weight"] = (audio_inner,)
        _attention(spec, f"{p}.video_to_audio_attn", audio_inner, inner,
                   audio_inner)
        spec[f"{p}.scale_shift_table_a2v_ca_video"] = (5, inner)
        spec[f"{p}.scale_shift_table_a2v_ca_audio"] = (5, audio_inner)
    return spec


# ---------------------------------------------------------------------------
# VAE decoder / encoder
# ---------------------------------------------------------------------------


def _causal_conv3d(spec: Spec, key: str, c_in: int, c_out: int, k: int = 3):
    """CausalConv3dFull nests the raw conv as `.conv.`
    (VideoConvolution.swift:354-355, Conv3dFull weight/bias :202-204).
    torch layout (O, I, T, H, W)."""
    spec[f"{key}.conv.weight"] = (c_out, c_in, k, k, k)
    spec[f"{key}.conv.bias"] = (c_out,)


def _vae_time_embedder(spec: Spec, prefix: str, out_dim: int) -> None:
    """VAETimestepEmbedderWrapper (VideoDecoder.swift:37-69): nested
    time_embedder.timestep_embedder.linear_{1,2}, 256 -> 256 -> out_dim."""
    _linear(spec, f"{prefix}.timestep_embedder.linear_1", 256, 256)
    _linear(spec, f"{prefix}.timestep_embedder.linear_2", 256, out_dim)


def vae_decoder_spec(base: int = 1024, latent: int = 128,
                     blocks_per_group: int = 5, patch: int = 4,
                     layout: str = "unified") -> Spec:
    """VAE decoder keys (VideoDecoder.swift:295-356): conv_in latent->base,
    alternating res-groups (base, base/2, base/4, base/8) and D2S upsamplers,
    conv_out base/8 -> 3*patch^2, timestep conditioning everywhere.

    layout="unified": flat `decoder.up_blocks.{0..6}.*` + top-level
    `per_channel_statistics.*` — the legacy rule ModelDownloader.swift:879-885.
    The flat layout MUST spell groups `res_blocks` (the Swift module key):
    a flat `up_blocks.0.resnets.*` would first match the diffusers rule
    (:870-874) and misroute onto up_blocks_2 — only the res_blocks spelling
    maps coherently, so that is what the real unified file carries.
    layout="diffusers": 3-up-block nesting `decoder.up_blocks.{i}.resnets/
    upsamplers.0` + `decoder.mid_block` + latents_mean/std — rules :856-876.
    NOTE the diffusers layout carries NO group time_embedders: `up_blocks.0.
    time_embedder` would legacy-map onto up_blocks_0 colliding with
    mid_block's (see test_vae_decoder_time_embedder_collision).
    """
    c = [base, base // 2, base // 4, base // 8]
    spec: Spec = {}
    _causal_conv3d(spec, "decoder.conv_in", latent, base)
    _causal_conv3d(spec, "decoder.conv_out", c[3], 3 * patch * patch)
    spec["decoder.last_scale_shift_table"] = (2, c[3])
    _vae_time_embedder(spec, "decoder.last_time_embedder", 2 * c[3])

    def group(prefix: str, ch: int, time_embedder: bool,
              res: str = "resnets"):
        for j in range(blocks_per_group):
            _causal_conv3d(spec, f"{prefix}.{res}.{j}.conv1", ch, ch)
            _causal_conv3d(spec, f"{prefix}.{res}.{j}.conv2", ch, ch)
            spec[f"{prefix}.{res}.{j}.scale_shift_table"] = (4, ch)
        if time_embedder:
            _vae_time_embedder(spec, f"{prefix}.time_embedder", 4 * ch)

    if layout == "unified":
        for gi, ch in zip((0, 2, 4, 6), c):
            group(f"decoder.up_blocks.{gi}", ch, time_embedder=True,
                  res="res_blocks")
        for ui, ch in zip((1, 3, 5), c):
            # D2S upsampler: conv ch -> (ch/2)*8 (VideoDecoder.swift:186-198)
            _causal_conv3d(spec, f"decoder.up_blocks.{ui}.conv",
                           ch, (ch // 2) * 8)
        spec["decoder.timestep_scale_multiplier"] = ()
        spec["per_channel_statistics.mean-of-means"] = (latent,)
        spec["per_channel_statistics.std-of-means"] = (latent,)
    elif layout == "diffusers":
        group("decoder.mid_block", c[0], time_embedder=False)
        for i, ch in enumerate(c[:3]):
            _causal_conv3d(spec, f"decoder.up_blocks.{i}.upsamplers.0.conv",
                           ch, (ch // 2) * 8)
            group(f"decoder.up_blocks.{i}", c[i + 1], time_embedder=False)
        spec["latents_mean"] = (latent,)
        spec["latents_std"] = (latent,)
    else:
        raise ValueError(layout)
    return spec


def vae_encoder_spec(base: int = 128) -> Spec:
    """Standalone-VAE-file encoder keys (`encoder.` prefix,
    VideoEncoder.swift:211-262): conv_in 48->base, 4 down blocks with
    resnet counts (4, 6, 6, 2) and s2d downsamplers whose conv emits
    out/stride-product channels, mid 2 resnets, conv_out 16*base -> 129."""
    spec: Spec = {}
    chans = [base, base * 2, base * 4, base * 8]        # 128..1024
    resnet_counts = (4, 6, 6, 2)
    stride_products = (4, 2, 8, 8)                       # (1,2,2),(2,1,1),(2,2,2),(2,2,2)
    _causal_conv3d(spec, "encoder.conv_in", 48, base)
    for i, (ch, n, sp) in enumerate(zip(chans, resnet_counts,
                                        stride_products)):
        for j in range(n):
            _causal_conv3d(spec, f"encoder.down_blocks.{i}.resnets.{j}.conv1",
                           ch, ch)
            _causal_conv3d(spec, f"encoder.down_blocks.{i}.resnets.{j}.conv2",
                           ch, ch)
        out_ch = ch * 2
        _causal_conv3d(spec, f"encoder.down_blocks.{i}.downsamplers.0.conv",
                       ch, out_ch // sp)
    top = base * 16
    for j in range(2):
        _causal_conv3d(spec, f"encoder.mid_block.resnets.{j}.conv1", top, top)
        _causal_conv3d(spec, f"encoder.mid_block.resnets.{j}.conv2", top, top)
    _causal_conv3d(spec, "encoder.conv_out", top, base + 1)
    return spec


# ---------------------------------------------------------------------------
# Text-encoder connector (both checkpoint formats)
# ---------------------------------------------------------------------------


def _connector_blocks(spec: Spec, prefix: str, dim: int, layers: int,
                      registers: int) -> None:
    """Embeddings1DConnector (LTXTextEncoder.swift:375-420): N
    BasicTransformerBlock1D (attn1 + ff) + learnable_registers. Checkpoint
    spellings: transformer_blocks. / norm_q / to_out.0 / ff.net.*
    (mapped by applyConnectorInternalMapping, ModelDownloader.swift:958-967)."""
    for i in range(layers):
        p = f"{prefix}.transformer_blocks.{i}"
        _attention(spec, f"{p}.attn1", dim, dim, dim)
        _ffn(spec, f"{p}.ff", dim)
    spec[f"{prefix}.learnable_registers"] = (registers, dim)


def connector_spec(fmt: int = 1, include_audio: bool = False,
                   dim: int = 3840, gemma_layers: int = 49,
                   layers: int = 2, registers: int = 128) -> Spec:
    """Text-encoder checkpoint keys.

    fmt=1 — standalone connectors file (ModelDownloader.swift:922-933):
      text_proj_in (BIAS-FREE, LTXTextEncoder.swift:138-142) +
      video_connector.* (+ audio_connector.*).
    fmt=2 — unified file post-split (ModelDownloader.swift:935-946):
      text_embedding_projection.aggregate_embed + video_embeddings_connector.*
      (+ audio_embeddings_connector.*).
    """
    spec: Spec = {}
    if fmt == 1:
        spec["text_proj_in.weight"] = (dim, dim * gemma_layers)
        _connector_blocks(spec, "video_connector", dim, layers, registers)
        if include_audio:
            _connector_blocks(spec, "audio_connector", dim, layers, registers)
    else:
        spec["text_embedding_projection.aggregate_embed.weight"] = (
            dim, dim * gemma_layers)
        _connector_blocks(spec, "video_embeddings_connector", dim, layers,
                          registers)
        if include_audio:
            _connector_blocks(spec, "audio_embeddings_connector", dim, layers,
                              registers)
    return spec


# ---------------------------------------------------------------------------
# Audio VAE + vocoder
# ---------------------------------------------------------------------------


def audio_vae_spec(latent: int = 8, base: int = 128, out_ch: int = 2,
                   num_res: int = 2, mel_bins_packed: int = 128) -> Spec:
    """Audio-VAE decoder-side keys (AudioVAE.swift:249-353): conv_in
    latent -> 4*base, mid 2 res blocks, up levels stored python-order
    [level0 256->128 (no upsample), level1 512->256, level2 512->512],
    each level num_res+1 blocks, first block carries nin_shortcut iff
    channels change; every conv nests `.conv.` (AudioCausalConv2d.swift:37-38),
    torch 4D layout. Plus latents_mean/std. The encoder.* keys in the same
    file are filtered out by loadAudioVAEWeights (ModelDownloader.swift:1116-1129)."""
    spec: Spec = {}
    mult = (1, 2, 4)
    top = base * mult[-1]

    def conv(key, ci, co, k=3):
        spec[f"{key}.conv.weight"] = (co, ci, k, k)
        spec[f"{key}.conv.bias"] = (co,)

    def res(prefix, ci, co):
        conv(f"{prefix}.conv1", ci, co)
        conv(f"{prefix}.conv2", co, co)
        if ci != co:
            conv(f"{prefix}.nin_shortcut", ci, co, k=1)

    conv("decoder.conv_in", latent, top)
    res("decoder.mid.block_1", top, top)
    res("decoder.mid.block_2", top, top)
    # level specs in python storage order (AudioVAE.swift:286-316):
    # in-channels walk top->..., upsample present for levels != 0
    level_in = {2: top, 1: top, 0: base * mult[1]}
    for lvl in (0, 1, 2):
        ci, co = level_in[lvl], base * mult[lvl]
        res(f"decoder.up.{lvl}.block.0", ci, co)
        for b in range(1, num_res + 1):
            res(f"decoder.up.{lvl}.block.{b}", co, co)
        if lvl != 0:
            conv(f"decoder.up.{lvl}.upsample.conv", co, co)
    conv("decoder.conv_out", base, out_ch)
    spec["latents_mean"] = (mel_bins_packed,)
    spec["latents_std"] = (mel_bins_packed,)
    return spec


def vocoder_spec(in_ch: int = 128, hidden: int = 1024, out_ch: int = 2,
                 up_factors=(6, 5, 2, 2, 2), up_kernels=(16, 15, 8, 4, 4),
                 res_kernels=(3, 7, 11), dils_per_res: int = 3) -> Spec:
    """HiFi-GAN vocoder keys (Vocoder.swift:132-215): conv_in k7, 5
    ConvTranspose1d upsamplers halving channels, 3 parallel res blocks per
    stage each with len(dilations) convs1+convs2 pairs, conv_out k7.
    torch layouts: Conv1d (O, I, K); ConvTranspose1d (I, O, K)
    (sanitize, Vocoder.swift:280-305)."""
    spec: Spec = {}
    spec["conv_in.weight"] = (hidden, in_ch, 7)
    spec["conv_in.bias"] = (hidden,)
    ch = hidden
    ri = 0
    for i, (f, k) in enumerate(zip(up_factors, up_kernels)):
        co = ch // 2
        spec[f"upsamplers.{i}.weight"] = (ch, co, k)   # ConvT: (in, out, k)
        spec[f"upsamplers.{i}.bias"] = (co,)
        for rk in res_kernels:
            for j in range(dils_per_res):
                spec[f"resnets.{ri}.convs1.{j}.weight"] = (co, co, rk)
                spec[f"resnets.{ri}.convs1.{j}.bias"] = (co,)
                spec[f"resnets.{ri}.convs2.{j}.weight"] = (co, co, rk)
                spec[f"resnets.{ri}.convs2.{j}.bias"] = (co,)
            ri += 1
        ch = co
    spec["conv_out.weight"] = (out_ch, ch, 7)
    spec["conv_out.bias"] = (out_ch,)
    return spec


# ---------------------------------------------------------------------------
# Spatial upscaler
# ---------------------------------------------------------------------------


def upscaler_spec(in_ch: int = 128, mid: int = 1024,
                  blocks_per_stage: int = 4) -> Spec:
    """Latent upscaler keys (SpatialUpscaler.swift:181-230): initial
    conv3d+groupnorm, 4 pre/post res blocks (conv3d+norm pairs), per-frame
    conv2d mid -> 4*mid for PixelShuffle, final conv3d. Plus a fixed
    blur_down kernel the reference SKIPS (SpatialUpscaler.swift:302-305)."""
    spec: Spec = {}

    def c3(key, ci, co):
        spec[f"{key}.weight"] = (co, ci, 3, 3, 3)
        spec[f"{key}.bias"] = (co,)

    def norm(key, c):
        spec[f"{key}.weight"] = (c,)
        spec[f"{key}.bias"] = (c,)

    def res(prefix):
        c3(f"{prefix}.conv1", mid, mid)
        norm(f"{prefix}.norm1", mid)
        c3(f"{prefix}.conv2", mid, mid)
        norm(f"{prefix}.norm2", mid)

    c3("initial_conv", in_ch, mid)
    norm("initial_norm", mid)
    for i in range(blocks_per_stage):
        res(f"res_blocks.{i}")
        res(f"post_upsample_res_blocks.{i}")
    spec["upsampler.conv.weight"] = (4 * mid, mid, 3, 3)
    spec["upsampler.conv.bias"] = (4 * mid,)
    c3("final_conv", mid, in_ch)
    spec["blur_down_kernel"] = (1, 1, 3, 3)   # skipped by loader
    return spec


# ---------------------------------------------------------------------------
# Gemma-3
# ---------------------------------------------------------------------------


def gemma_spec(layers: int = 48, hidden: int = 3840, heads: int = 16,
               kv_heads: int = 8, head_dim: int = 256,
               intermediate: int = 15360, vocab: int = 262208,
               mlx_4bit: bool = False, group: int = 64,
               vlm_prefix: bool = False) -> Spec:
    """Gemma-3-12B HF/MLX checkpoint keys (Gemma3Config.swift:44-57 dims;
    sanitize rules Gemma3Model.swift:347-370: strip language_model., drop
    lm_head). mlx_4bit: every Linear ships as packed uint32 .weight (in/8
    words) + .scales/.biases grouped along input (group 64) — layout per
    mlx.core.quantize, repacked by keymaps._repack_mlx_4bit."""
    spec: Spec = {}

    def dense(key, d_in, d_out):
        if mlx_4bit:
            spec[f"{key}.weight"] = (d_out, d_in // 8)
            spec[f"{key}.scales"] = (d_out, d_in // group)
            spec[f"{key}.biases"] = (d_out, d_in // group)
        else:
            spec[f"{key}.weight"] = (d_out, d_in)

    dense("model.embed_tokens", hidden, vocab)
    spec["model.norm.weight"] = (hidden,)
    dense("lm_head", hidden, vocab)   # dropped by sanitize
    for i in range(layers):
        p = f"model.layers.{i}"
        dense(f"{p}.self_attn.q_proj", hidden, heads * head_dim)
        dense(f"{p}.self_attn.k_proj", hidden, kv_heads * head_dim)
        dense(f"{p}.self_attn.v_proj", hidden, kv_heads * head_dim)
        dense(f"{p}.self_attn.o_proj", heads * head_dim, hidden)
        spec[f"{p}.self_attn.q_norm.weight"] = (head_dim,)
        spec[f"{p}.self_attn.k_norm.weight"] = (head_dim,)
        dense(f"{p}.mlp.gate_proj", hidden, intermediate)
        dense(f"{p}.mlp.up_proj", hidden, intermediate)
        dense(f"{p}.mlp.down_proj", intermediate, hidden)
        for nrm in ("input_layernorm", "post_attention_layernorm",
                    "pre_feedforward_layernorm",
                    "post_feedforward_layernorm"):
            spec[f"{p}.{nrm}.weight"] = (hidden,)
    if vlm_prefix:
        spec = {f"language_model.{k}": v for k, v in spec.items()}
    return spec


# ---------------------------------------------------------------------------
# Helpers
# ---------------------------------------------------------------------------


def param_count(spec: Spec) -> int:
    return sum(int(np.prod(s)) for s in spec.values())


def materialize(spec: Spec, seed: int = 0, scale: float = 0.02,
                int_keys: Tuple[str, ...] = (".weight_scale",)) -> dict:
    """Spec -> {key: np.ndarray}. 4-bit packed .weight tensors (paired with
    .scales) become uint32; everything else float32 noise."""
    rng = np.random.default_rng(seed)
    out = {}
    for key, shape in spec.items():
        if key.endswith(".weight") and f"{key[:-7]}.scales" in spec:
            out[key] = rng.integers(0, 2 ** 32, size=shape,
                                    dtype=np.uint32)
        elif key.endswith((".scales", ".biases")):
            out[key] = rng.standard_normal(shape).astype(np.float32) * 0.01
        else:
            out[key] = (rng.standard_normal(shape) * scale).astype(np.float32)
    return out


class TrackingDict(dict):
    """dict that records which keys a loader read (get/pop/[]), so the
    contract test can assert 100% consumption without modifying loaders."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.consumed = set()

    def __getitem__(self, key):
        self.consumed.add(key)
        return super().__getitem__(key)

    def get(self, key, default=None):
        if super().__contains__(key):
            self.consumed.add(key)
        return super().get(key, default)

    def pop(self, key, *default):
        if super().__contains__(key):
            self.consumed.add(key)
        return super().pop(key, *default)

    @property
    def unconsumed(self):
        return set(super().keys()) - self.consumed
