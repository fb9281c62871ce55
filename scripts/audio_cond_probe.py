"""AV-chain audio-continuity experiment (VERDICT r4 next #6).

Measures mel-spectral discontinuity AT THE SEGMENT SEAM of a 2-segment AV
chain, comparing the two stitch modes:

  * crossfade-only (the r4 default): each segment's audio is generated
    fresh; the linear crossfade blends two UNRELATED waveforms over the
    overlap window;
  * audio_cond=True (round 5): the previous segment's audio tail latents
    carry through the AV step's audio conditioning (the exact audio analog
    of the video cond_frames path), so the overlap re-renders matching
    content and the crossfade blends near-identical signals.

Metric: "seam jump" = max spectral flux (L2 of log-mel frame deltas) in a
window around the seam, normalized by the MEDIAN flux elsewhere in the
clip. ~1 means the seam is statistically indistinguishable from ordinary
frame-to-frame variation; >> 1 means an audible discontinuity.

CAVEAT (why this is an offline mechanism measurement, not a listening
test): weights are random — the decoded audio is noise-like in CONTENT,
but the conditioning mechanics (does the overlap decode to the same
signal? does the seam flux drop?) are exactly what real weights would
exercise; real-checkpoint listening validation is blocked on zero egress.

Run: python scripts/audio_cond_probe.py  (CPU, ~2 min)
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def log_mel(wave: np.ndarray, sr: int = 24000, n_fft: int = 512,
            hop: int = 128, n_mels: int = 40):
    """Minimal log-mel spectrogram (numpy-only; no scipy/librosa)."""
    mono = wave.mean(axis=0)
    # tiny-model waveforms are short — scale the analysis windows so the
    # spectrogram has enough frames for seam/away statistics
    n_fft = min(n_fft, max(16, len(mono) // 16))
    hop = max(4, n_fft // 4)
    n_mels = min(n_mels, n_fft // 2)
    frames = []
    win = np.hanning(n_fft)
    for s in range(0, len(mono) - n_fft, hop):
        frames.append(np.abs(np.fft.rfft(mono[s:s + n_fft] * win)))
    spec = np.stack(frames)  # (T, F)
    # triangular mel bank
    freqs = np.fft.rfftfreq(n_fft, 1.0 / sr)
    mel = 2595 * np.log10(1 + freqs / 700)
    pts = np.linspace(0, mel[-1], n_mels + 2)
    bank = np.zeros((n_mels, len(freqs)))
    for i in range(n_mels):
        lo, ce, hi = pts[i], pts[i + 1], pts[i + 2]
        up = (mel - lo) / max(ce - lo, 1e-9)
        dn = (hi - mel) / max(hi - ce, 1e-9)
        bank[i] = np.clip(np.minimum(up, dn), 0, None)
    return np.log(spec @ bank.T + 1e-8)  # (T, n_mels)


def seam_jump(wave: np.ndarray, seam_sample: int):
    """Max spectral flux near the seam / median flux elsewhere."""
    mono_len = wave.shape[-1]
    n_fft = min(512, max(16, mono_len // 16))
    hop = max(4, n_fft // 4)
    m = log_mel(wave)
    flux = np.linalg.norm(np.diff(m, axis=0), axis=1)  # (T-1,)
    seam_frame = seam_sample // hop
    w = max(2, len(flux) // 10)
    lo = max(seam_frame - w, 0)
    hi = min(seam_frame + w, len(flux))
    near = flux[lo:hi]
    away = np.concatenate([flux[:lo], flux[hi:]])
    return float(near.max() / (np.median(away) + 1e-9))


def main():
    from ltx_tpu.core.config import GenerationConfig
    from ltx_tpu.pipeline.generate import LTXPipeline

    pipe = LTXPipeline.random_tiny(seed=0, include_audio=True)
    pipe.memory = dataclasses.replace(pipe.memory,
                                      offload_text_encoder=False)
    cfg = GenerationConfig(width=64, height=64, num_frames=25, num_steps=2,
                           seed=11, image_cond_noise_scale=0.15)
    cond_frames = 9

    rows = {}
    overlap_info = {}
    for mode, flag in (("crossfade_only", False), ("audio_cond", True)):
        r = pipe.generate_video_chain_with_audio(
            "a long take", cfg, segments=2, cond_frames=cond_frames,
            audio_cond=flag)
        wave = np.asarray(r.audio, np.float32)
        # one segment's waveform length (from a solo run of the same cfg)
        if "seg_samples" not in overlap_info:
            solo = pipe.generate_video_with_audio("a long take", cfg)
            overlap_info["seg_samples"] = int(
                np.asarray(solo.audio).shape[-1])
        s = overlap_info["seg_samples"]
        k = int(round(s * cond_frames / cfg.num_frames))
        # seam = center of the crossfade window [s - k, s)
        rows[mode] = {
            "seam_jump": round(seam_jump(wave, s - k // 2), 3),
            "samples": int(wave.shape[-1]),
        }
        print(f"{mode}: seam_jump={rows[mode]['seam_jump']}", flush=True)

    rows["note"] = ("seam_jump ~1 = seam indistinguishable from ordinary "
                    "frame-to-frame variation; random weights — mechanism "
                    "measurement, not a listening test")
    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
