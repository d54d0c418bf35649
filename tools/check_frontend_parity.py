"""On-device frontend precision gate (run on the real TPU chip).

Gates the TRAINED configuration (models/asr.py frontend_precision="high",
3-pass MXU DFT) against the "highest" (6-pass) reference on device, plus
both against a float64 host oracle. PROFILE.md records the measured
deviation (<= 1.1e-3 log-mel); this tool turns that number into a pass/
fail gate like tools/check_ffn_parity.py does for the Pallas kernels.

Usage: python tools/check_frontend_parity.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from espnet_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    dev = jax.devices()[0]
    print(f"device: {dev}")

    from espnet_tpu.ops.stft import log_mel_spectrogram, mel_filterbank

    rng = np.random.RandomState(0)
    n = 4 * 16000
    x = (0.3 * np.sin(2 * np.pi * 440 * np.arange(n) / 16000)
         + 0.1 * rng.randn(n)).astype(np.float32)[None]
    lens = jnp.asarray([n], np.int32)

    outs = {}
    for prec in ("highest", "high"):
        f, fl = jax.jit(
            lambda s, l, p=prec: log_mel_spectrogram(s, l, precision=p)
        )(jnp.asarray(x), lens)
        outs[prec] = np.asarray(f[0, : int(fl[0])], np.float64)

    # float64 host oracle (numpy rfft + the same mel matrix)
    import numpy.fft as nfft

    n_fft, hop = 512, 128
    pad = n_fft // 2
    xp = np.pad(x[0].astype(np.float64), (pad, pad), mode="reflect")
    nfr = outs["highest"].shape[0]
    win = np.hanning(n_fft + 1)[:-1]
    frames = np.stack([xp[i * hop: i * hop + n_fft] * win
                       for i in range(nfr)])
    spec = nfft.rfft(frames, axis=-1)
    power = np.abs(spec) ** 2
    mel = power @ mel_filterbank(16000, n_fft, 80).astype(np.float64)
    oracle = np.log(np.maximum(mel, 1e-10))

    dev_hh = np.abs(outs["high"] - outs["highest"]).max()
    dev_ho = np.abs(outs["high"] - oracle).max()
    dev_xo = np.abs(outs["highest"] - oracle).max()
    print(f"log-mel max dev: high-vs-highest {dev_hh:.2e}, "
          f"high-vs-oracle {dev_ho:.2e}, highest-vs-oracle {dev_xo:.2e}")
    ok = dev_hh <= 2e-3 and dev_ho <= 5e-3
    print("FRONTEND PRECISION " + ("PARITY OK" if ok else "PARITY FAIL"))
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
