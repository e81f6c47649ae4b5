"""SWIPE' and VAD vs golden reference outputs on SA19.WAV."""
import jax
import numpy as np
import pytest

from eaqhm_tpu.models import swipe, vad

# f64 (CPU parity tier) admits exact assertions; the f32 TPU tier
# (EAQHM_TPU_TESTS=1) keeps documented threshold-straddle tolerances
_X64 = bool(jax.config.jax_enable_x64)


@pytest.fixture(scope="module")
def plan(sa19):
    fs, s = sa19
    return swipe.make_plan(float(fs), 160.0, 300.0, len(s))


class TestSwipe:
    def test_candidate_grid(self, plan, golden):
        ref = golden["swipep_out"]
        assert len(plan.t) == ref.shape[0]
        np.testing.assert_allclose(plan.t, ref[:, 0], atol=1e-12)

    def test_full_output_matches_reference(self, plan, sa19, golden):
        fs, s = sa19
        ref = golden["swipep_out"]
        out = np.asarray(swipe.swipep(plan, s))
        # strengths: direct numeric comparison (f64) / measured f32 bounds
        # (TPU tier, chip-measured 2026-08-21: max abs dev 0.0255 on
        # low-strength unvoiced frames — the column-normalized loudness of
        # near-silent columns is a ratio of near-cancelling f32 sums; the
        # end-to-end gate is bench.py's matched SRER, -0.047 dB)
        if _X64:
            np.testing.assert_allclose(out[:, 2], ref[:, 2], rtol=1e-6,
                                       atol=1e-9)
        else:
            np.testing.assert_allclose(out[:, 2], ref[:, 2], rtol=0,
                                       atol=0.06)
        rel = np.abs(out[:, 1] - ref[:, 1]) / ref[:, 1]
        if _X64:
            # f64 path: EVERY frame's pitch matches the reference exactly up
            # to fine-tune rounding (verified 0/3968 deviating frames on
            # SA19; round-3 root-cause of the former 0.5% carve-out — it was
            # only ever exercised by the f32 branch below)
            assert rel.max() < 1e-9, rel.max()
        else:
            # f32 (EAQHM_TPU_TESTS=1): near-tie argmax decisions between
            # adjacent 1/96-octave candidates can flip under f32 strength
            # rounding; bound the rate and the error everywhere else
            # (chip-measured 2026-08-21: median 1.5e-6, flip rate 2.0% —
            # bound set at 3% so a further ~1.5x regression fails, ADVICE
            # r4 item 5)
            assert np.median(rel) < 1e-5, np.median(rel)
            assert (rel > 1e-3).mean() < 0.03, (rel > 1e-3).mean()

    def test_pitch_within_limits(self, plan, sa19):
        fs, s = sa19
        out = np.asarray(swipe.swipep(plan, s))
        # fine-tune can land one fine-grid step outside the coarse range
        assert out[:, 1].min() > 160 / 2 ** (3 / 96)
        assert out[:, 1].max() < 300 * 2 ** (3 / 96)


class TestVad:
    def test_flags_match_golden(self, sa19, golden):
        fs, s = sa19
        if _X64:
            ti, sp, vo, fstep = vad.voiced_unvoiced_frames(s, fs,
                                                           is_male=False)
        else:
            # f32 tier: the DEVICE VAD path is f64-only by contract — the
            # 30 Hz elliptic recursion (poles at radius 0.99939) diverges
            # in f32 (chip-measured: 666 flag flips, i.e. garbage).  The
            # production engine runs the HOST f64 VAD on every backend
            # (vad.voiced_unvoiced_frames_host; engine.py), so the TPU
            # tier asserts THAT path against the golden flags.
            ti, sp, vo, fstep = vad.voiced_unvoiced_frames_host(
                np.asarray(s, np.float64), fs, is_male=False)
        assert fstep == int(golden["vad_frame_step"])
        np.testing.assert_array_equal(ti, golden["vad_ti"])
        sp = np.asarray(sp)
        vo = np.asarray(vo)
        sp_flips = (sp != golden["vad_isSpeech"]).sum()
        vo_flips = (vo != golden["vad_isVoiced"]).sum()
        # flags are bit-identical to the reference on the production path
        # (host f64) on every backend (verified 0 flips on SA19)
        assert sp_flips == 0, sp_flips
        assert vo_flips == 0, vo_flips

    def test_full_waveform_fixup_all_voiced(self, sa19, golden):
        import jax.numpy as jnp
        fs, s = sa19
        ti = golden["vad_ti"]
        sp = jnp.asarray(golden["vad_isSpeech"])
        vo = jnp.asarray(golden["vad_isVoiced"])
        margin = 32 * 15
        sp2, vo2 = vad.full_waveform_fixup(jnp.asarray(ti), sp, vo,
                                           margin, len(s))
        inside = (ti > margin / 2) & (ti < len(s) - margin / 2)
        assert bool(np.all(np.asarray(vo2)[inside]))
