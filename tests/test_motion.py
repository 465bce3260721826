"""Motion-compensated P frames in RBV."""

import numpy as np

from rabbit_transcoding_tpu.core.image import Video
from rabbit_transcoding_tpu.utils.enums import ColorFormat
from rabbit_transcoding_tpu.video import rbv


def translating_video(frames=4, h=128, w=192, shift=4, bitdepth=8, seed=0):
    """Rich static texture translating `shift` px/frame — the case motion
    compensation exists for."""
    rng = np.random.default_rng(seed)
    maxval = (1 << bitdepth) - 1
    big = rng.uniform(0, maxval, (h + shift * frames, w + shift * frames))
    # smooth it so it's codeable but still rich
    for _ in range(2):
        big = (big + np.roll(big, 1, 0) + np.roll(big, 1, 1)
               + np.roll(big, -1, 0) + np.roll(big, -1, 1)) / 5.0
    v = Video.zeros(frames, w, h, bitdepth, ColorFormat.YUV400)
    for f in range(frames):
        o = f * shift
        v.planes[0][f] = big[o : o + h, o : o + w].astype(
            np.uint8 if bitdepth <= 8 else np.uint16
        )
    return v


def psnr(a, b, maxval):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return np.inf if mse == 0 else 10 * np.log10(maxval * maxval / mse)


class TestMotionCompensation:
    def test_mc_closed_loop(self):
        v = translating_video()
        payload, recon = rbv.encode(
            v, rbv.RbvParams(qp=24, gop_size=4, motion=True)
        )
        assert rbv.probe(payload)["frame_count"] == 4
        dec = rbv.decode(payload)
        np.testing.assert_array_equal(recon.planes[0], dec.planes[0])

    def test_mc_beats_zero_mv_on_translation(self):
        v = translating_video(shift=4)
        p_mc, _ = rbv.encode(v, rbv.RbvParams(qp=24, gop_size=4, motion=True))
        p_no, _ = rbv.encode(v, rbv.RbvParams(qp=24, gop_size=4, motion=False))
        assert len(p_mc) < 0.8 * len(p_no), (len(p_mc), len(p_no))
        # and quality is no worse
        d_mc = rbv.decode(p_mc)
        d_no = rbv.decode(p_no)
        q_mc = psnr(v.planes[0], d_mc.planes[0], 255)
        q_no = psnr(v.planes[0], d_no.planes[0], 255)
        assert q_mc >= q_no - 0.5, (q_mc, q_no)

    def test_mc_transcode_mv_reuse(self):
        v = translating_video()
        payload, _ = rbv.encode(
            v, rbv.RbvParams(qp=12, gop_size=4, motion=True)
        )
        out = rbv.transcode_payload(payload, 28)
        info = rbv.probe(out)
        assert info["qp"] == 28 and info["gop_size"] == 4
        assert len(out) < len(payload)
        dec = rbv.decode(out)
        assert psnr(v.planes[0], dec.planes[0], 255) > 30

    def test_mc_requantize_passthrough(self):
        v = translating_video()
        payload, _ = rbv.encode(
            v, rbv.RbvParams(qp=12, gop_size=4, motion=True)
        )
        out = rbv.requantize(payload, 26)
        assert rbv.probe(out)["qp"] == 26
        dec = rbv.decode(out)
        assert psnr(v.planes[0], dec.planes[0], 255) > 28
