"""On-device int16 PCM decode.

int16 waveforms ride host->device at half the bytes of float32 and decode
inside the jitted program (waveform / 32767, matching the host-side
``int16_to_float32`` in data/audio_io.py and the reference
utilities.py:136-138). This is THE one definition of the wire convention -
the serving, eval, and training ingest paths all call it, so the
bit-identical-ingest guarantee certified by the int16 tests cannot drift
between paths.
"""

from __future__ import annotations

import jax.numpy as jnp

from audioset_convnext_inf_tpu.config import INT16_SCALE


def decode_pcm_if_int16(waveform: jnp.ndarray) -> jnp.ndarray:
    """int16 -> float32 in [-1, 1] (x * 1/32767); other dtypes unchanged."""
    if waveform.dtype == jnp.int16:
        return waveform.astype(jnp.float32) * INT16_SCALE
    return waveform
