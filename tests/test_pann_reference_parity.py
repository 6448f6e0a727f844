"""PANN-zoo parity against the ACTUAL reference ``pytorch/models.py``.

Round-2 VERDICT: the zoo's only numerical evidence was a builder-written
Cnn14 oracle (same-author risk). Here every *family* and every distinct
code path in ``models/pann.py`` + ``checkpoint/pann_convert.py`` is checked
against the reference's own classes (models.py, loaded unmodified through
``tests/reference_shim.load_reference_pann_models`` - flat-import path +
the two documented undefined-name defects patched, SURVEY.md section 2.3),
with real random weights flowing through the rule-based converter:

 - cnn family: double-3x3 / 5x5 / separable / separable-pointwise blocks,
   embedding-size variants, 16 kHz + 128-mel frontends, and the
   DeformableConv2d blocks (reference runs through a torch.grid_sample
   re-expression of torchvision's deform_conv2d - independent of our
   gather+matmul ops/deform_conv.py);
 - sed family: DecisionLevelMax + clamped-softmax attention (models.py:2059);
 - resnet family: basic (ResNet22) and bottleneck (ResNet54) blocks with
   both downsample layouts;
 - mobilenet_v1/v2: depthwise ladders, expand/project residuals;
 - raw-waveform families: LeeNet11/24, DaiNet19, Res1dNet31;
 - wavegram family: learned wavegram, logmel concat, 128-group variant
   (models.py:5040-5205);
 - cnn_next hybrids: stem/no-stem, avg/no/conv pooling, BlockGroup1, and
   the no-fc1 head (models.py:268-1876).

Frontends are independent implementations (torch.stft vs our GEMM-DFT), so
probability agreement is evidence, not tautology.
"""

import contextlib
import io
import zlib

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from audioset_convnext_inf_tpu.checkpoint.pann_convert import pann_state_dict_to_params
from audioset_convnext_inf_tpu.models.pann import PANN_REGISTRY, PannModel

from tests.reference_shim import load_reference_pann_models

ref_models = load_reference_pann_models()

# reference class name -> extra constructor kwargs (deformable lists are
# 1-based on both sides: the reference does list_bool_deformable[i-1]
# (models.py:2536-2539), matching our PannConfig.deformable_blocks)
PARITY_MODELS = {
    "Cnn14": {},
    "Cnn6": {},
    "Cnn14Sep": {},
    "Cnn14SepPW": {},
    "Cnn14Deformable": {"deformable": [5, 6]},
    "Cnn6Deformable": {"deformable": [3, 4]},
    "Cnn14_emb512": {},
    "Cnn14_16k": {},
    "Cnn14_mel128": {},
    "Cnn14_DecisionLevelMax": {},
    "Cnn14_DecisionLevelAtt": {},
    "ResNet22": {},
    "ResNet54": {},
    "MobileNetV1": {},
    "MobileNetV2": {},
    "LeeNet11": {},
    "LeeNet24": {},
    "DaiNet19": {},
    "Res1dNet31": {},
    "Wavegram_Cnn14": {},
    "Wavegram_Logmel_Cnn14": {},
    "Wavegram_Logmel128_Cnn14": {},
    "Cnn6Next": {},
    "Cnn6NextConvPool": {},
    "Cnn6NextConvPoolGroup1": {},
    "Cnn8NextNoStemNoFC1": {},
    "Cnn10Next": {},
    "Cnn14Next": {},
    # Round 3: the remaining 21 runnable registry models. Each shares a
    # code path already verified above, but running all 49 removes any
    # doubt about per-model config wiring (depths, pool ladders, embedding
    # sizes, frontend rates) in PANN_REGISTRY vs the reference classes.
    "Cnn10": {},
    "Cnn10Next11": {},
    "Cnn10NextDropPath": {},
    "Cnn10NextNoStem": {},
    "Cnn14_8k": {},
    "Cnn14_DecisionLevelAvg": {},
    "Cnn14_emb128": {},
    "Cnn14_emb32": {},
    "Cnn14_mel32": {},
    "Cnn14_mixup_time_domain": {},
    "Cnn14_no_dropout": {},
    "Cnn14_no_specaug": {},
    "Cnn6Next11": {},
    "Cnn6Next11NoStem": {},
    "Cnn6Next13": {},
    "Cnn6Next13NoStem": {},
    "Cnn6NextNoLastPool": {},
    "Cnn6NextNoStem": {},
    "Cnn7Next": {},
    "Res1dNet51": {},
    "ResNet38": {},
}


def _build_reference(name: str, seed: int, spread: float = 0.05):
    cfg = PANN_REGISTRY[name]
    fe = cfg.frontend
    torch.manual_seed(seed)
    cls = getattr(ref_models, name)
    with contextlib.redirect_stdout(io.StringIO()):  # init_layer prints
        m = cls(
            sample_rate=fe.sample_rate,
            window_size=fe.n_fft,
            hop_size=fe.hop_length,
            mel_bins=fe.n_mels,
            fmin=fe.fmin,
            fmax=fe.fmax,
            classes_num=527,
            **PARITY_MODELS[name],
        )
    # trunc_normal(0.02) init barely moves sigmoids; spread the weights and
    # the BN running stats so parity is non-trivial (same trick as
    # test_reference_parity._small_reference_model)
    with torch.no_grad():
        for p in m.parameters():
            if p.requires_grad:
                p.add_(spread * torch.randn_like(p))
        for mod in m.modules():
            if isinstance(mod, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                mod.running_mean.normal_(0, 0.3)
                mod.running_var.uniform_(0.5, 2.0)
    m.eval()
    return m


@pytest.mark.parametrize("name", sorted(PARITY_MODELS))
def test_reference_parity(name, rng):
    cfg = PANN_REGISTRY[name]
    # zlib.crc32, not hash(): str hash is PYTHONHASHSEED-randomized per
    # process, which made the reference weights (and thus marginal
    # tolerance outcomes) differ run to run.
    # Deformable models get a smaller spread: 0.05 over six blocks inflates
    # activations ~2.8e3x, and the two INDEPENDENT f32 bilinear-sampling
    # paths amplify rounding into visible probability deltas; 0.02 keeps the
    # net well-conditioned (probs std ~0.35, still non-trivial) so the
    # standard tight tolerances apply
    spread = 0.02 if cfg.deformable_blocks else 0.05
    ref = _build_reference(name, seed=zlib.crc32(name.encode()) % 2**31,
                           spread=spread)

    n = cfg.frontend.sample_rate  # one-second clips
    wav = (rng.randn(2, n) * 0.2).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(wav))

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = pann_state_dict_to_params(sd, cfg)
    model = PannModel(cfg, params)

    # converter completeness: every trainable reference tensor landed
    ref_n = sum(p.numel() for p in ref.parameters() if p.requires_grad)
    assert model.count_parameters() == ref_n, name

    out = model.forward(jnp.asarray(wav))
    # Two-level tolerance: the spread trick drives many sigmoids near
    # saturation, where CPU threading-dependent reduction order (both torch
    # and XLA) scatters a FEW elements past a flat 5e-4 atol run-to-run
    # (observed: 1/1054 at 8.3e-4, the failing model changing with test
    # order). Bulk must stay tight; the worst element is bounded separately.
    diffs = np.abs(np.asarray(out["clipwise_output"])
                   - ref_out["clipwise_output"].numpy())
    assert float(np.quantile(diffs, 0.995)) < 5e-4, (
        f"{name}: p99.5 |dprobs| {np.quantile(diffs, 0.995):.2e}")
    assert float(diffs.max()) < 2e-3, (
        f"{name}: max |dprobs| {diffs.max():.2e}")
    if "embedding" in ref_out and "embedding" in out:
        np.testing.assert_allclose(
            np.asarray(out["embedding"]),
            ref_out["embedding"].numpy(),
            atol=5e-3,
            rtol=1e-3,
            err_msg=name,
        )
    if "framewise_output" in ref_out:
        np.testing.assert_allclose(
            np.asarray(out["framewise_output"]),
            ref_out["framewise_output"].numpy(),
            atol=5e-4,
            err_msg=name,
        )


def test_shim_deform_conv2d_matches_ours(rng):
    """Direct op-level check: torchvision-semantics deform_conv2d via
    torch.grid_sample (reference side) vs our gather+matmul kernel, with
    large random offsets and a modulator mask."""
    from audioset_convnext_inf_tpu.ops.deform_conv import deform_conv2d

    b, h, w, c, o, k = 2, 12, 9, 6, 8, 3
    x = rng.randn(b, h, w, c).astype(np.float32)
    weight = (rng.randn(k, k, c, o) * 0.2).astype(np.float32)
    offset = (rng.randn(b, h, w, 2 * k * k) * 2.5).astype(np.float32)
    mask = rng.rand(b, h, w, k * k).astype(np.float32)

    ours = deform_conv2d(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(weight),
        mask=jnp.asarray(mask), padding=(1, 1),
    )

    from tests.reference_shim import _tv_deform_conv2d

    ref = _tv_deform_conv2d(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        torch.from_numpy(offset).permute(0, 3, 1, 2),
        torch.from_numpy(weight).permute(3, 2, 0, 1),
        padding=(1, 1),
        mask=torch.from_numpy(mask).permute(0, 3, 1, 2),
    )
    np.testing.assert_allclose(
        np.asarray(ours), ref.permute(0, 2, 3, 1).numpy(), atol=2e-4
    )
