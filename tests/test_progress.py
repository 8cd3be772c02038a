"""EpochProgress: bounded-rate live line (reference tqdm equivalent)."""

import io
import time

from cswin_simam_unet_tpu.train.reporting import EpochProgress


class _Tty(io.StringIO):
    def isatty(self):
        return True


def test_tty_rendering_and_rate_bound():
    stream = _Tty()
    p = EpochProgress(epoch=0, num_epochs=10, total_batches=5,
                      stream=stream, refresh_s=0.0)
    p.update(1, 4, {"loss": 0.5, "dice": 0.25, "iou": 0.125})
    out = stream.getvalue()
    assert "\r" in out and "epoch 1/10" in out and "batch 1/5" in out
    assert "loss 0.5000" in out and "dice 0.2500" in out
    p.close()
    assert stream.getvalue().endswith("\x1b[K")


def test_refresh_rate_skips_fetches():
    stream = _Tty()
    p = EpochProgress(epoch=0, num_epochs=1, stream=stream, refresh_s=3600)

    class Exploding(dict):
        def __getitem__(self, k):  # metric fetch must NOT happen when
            raise AssertionError("fetched metrics inside refresh window")

    t0 = time.time()
    p._last = t0  # freshly rendered
    p.update(1, 4, Exploding())  # within the window -> no fetch, no write
    assert stream.getvalue() == ""


def test_plain_stream_writes_full_lines():
    stream = io.StringIO()
    p = EpochProgress(epoch=2, num_epochs=3, total_batches=None,
                      stream=stream, plain_interval_s=0.0)
    p.update(7, 56, {"loss": 1.0, "dice": 0.0, "iou": 0.0})
    out = stream.getvalue()
    assert out.endswith("\n") and "\r" not in out and "epoch 3/3" in out
