"""Config-level protocol knobs: the TTA orientation setting.

The reference hard-codes `mirror_axes=[0,1,2]` at `4_predict.py:208-211`;
here the orientation count is a first-class serving knob
(`PredictionConfig.tta_orientations`) with a documented cost curve
(BENCH_NOTES.md TTA section).
"""

import pytest

from waveformer_tpu.config import Config, PredictionConfig


class TestTTAKnob:
    @pytest.mark.parametrize(
        "n,axes",
        [(1, ()), (2, (0,)), (4, (0, 1)), (8, (0, 1, 2))],
    )
    def test_orientations_map_to_mirror_axes(self, n, axes):
        cfg = PredictionConfig(tta_orientations=n)
        assert cfg.mirror_axes == axes
        want = None if n == 1 else axes
        assert cfg.effective_mirror_axes() == want

    def test_invalid_count_rejected(self):
        with pytest.raises(ValueError, match="1/2/4/8"):
            PredictionConfig(tta_orientations=3)

    def test_default_is_reference_protocol(self):
        cfg = PredictionConfig()
        assert cfg.mirror_axes == (0, 1, 2)
        assert cfg.effective_mirror_axes() == (0, 1, 2)

    def test_yaml_roundtrip(self):
        cfg = Config.from_dict(
            {"prediction": {"tta_orientations": 2, "overlap": 0.5}}
        )
        assert cfg.prediction.mirror_axes == (0,)

    def test_explicit_mirror_axes_without_knob(self):
        cfg = Config.from_dict({"prediction": {"mirror_axes": [0, 2]}})
        assert cfg.prediction.mirror_axes == (0, 2)
        assert cfg.prediction.effective_mirror_axes() == (0, 2)
