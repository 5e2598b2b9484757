"""Service endpoint, batch checkpoint/resume, and throughput harness tests."""

import json
import os

import numpy as np
import pytest

from ug_stereomatcher_tpu.config import MatcherConfig
from ug_stereomatcher_tpu.engine import StereoEngine
from ug_stereomatcher_tpu.io.image import save_image
from ug_stereomatcher_tpu.pipeline import BatchRunner, ImageListCapture
from ug_stereomatcher_tpu.pipeline.messages import GetDisparitiesRequest
from ug_stereomatcher_tpu.pipeline.service import DisparityService


def _pair(h=48, w=64, seed=0):
    rng = np.random.RandomState(seed)
    img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    return img, img


class TestService:
    def test_plain_response(self):
        svc = DisparityService(StereoEngine(MatcherConfig()))
        l, r = _pair()
        rsp = svc(GetDisparitiesRequest(left=l, right=r))
        assert rsp.disp_h is not None and rsp.fdisp_h is None
        assert rsp.disp_h.image.shape == (48, 64)
        assert rsp.disp_h.header.seq == 1
        svc(GetDisparitiesRequest(left=l, right=r))
        assert svc.requests_served == 2

    def test_foveated_response(self):
        cfg = MatcherConfig(fovea_level=3)
        svc = DisparityService(StereoEngine(cfg), foveated=True)
        l, r = _pair(96, 128)
        rsp = svc(GetDisparitiesRequest(left=l, right=r))
        assert rsp.fdisp_h is not None and rsp.disp_h is None
        fov_h, fov_w = cfg.fovea_dims(96, 128)
        assert rsp.fdisp_h.image_stack.shape == (cfg.fovea_level * fov_h, fov_w)
        assert rsp.fdisp_h.num_levels == cfg.fovea_level


class TestCheckpointResume:
    def test_resume_skips_completed(self, tmp_path):
        paths = []
        for i in range(2):
            for side in ("l", "r"):
                p = tmp_path / f"{side}{i}.png"
                save_image(str(p), _pair(seed=i)[0])
                paths.append(str(p))
        man = tmp_path / "m.txt"
        man.write_text("\n".join(paths))
        ck = str(tmp_path / "progress.jsonl")
        out = str(tmp_path / "out")

        runner = BatchRunner(StereoEngine(MatcherConfig()), out_dir=out,
                             checkpoint_path=ck)
        r1 = runner.run(ImageListCapture(str(man)))
        assert len(r1) == 2
        lines = open(ck).read().strip().splitlines()
        assert len(lines) == 2
        assert json.loads(lines[0])["index"] == 0

        # second run resumes: nothing left to do
        r2 = runner.run(ImageListCapture(str(man)))
        assert len(r2) == 0

        # delete one dump -> that pair re-runs
        victim = json.loads(lines[1])["dump_paths"]["H"]
        os.remove(victim)
        r3 = runner.run(ImageListCapture(str(man)))
        assert [r.index for r in r3] == [1]
        assert os.path.exists(victim)


class TestThroughput:
    def test_scaling_on_cpu_mesh(self):
        import jax
        from ug_stereomatcher_tpu.parallel import measure_throughput
        n = min(4, len(jax.devices()))
        pts = measure_throughput(height=48, width=64,
                                 device_counts=[1, n], repeats=2)
        assert pts[0].n_devices == 1
        assert pts[-1].n_devices == n
        assert pts[0].pairs_per_second > 0
        # efficiency is relative to the first point
        assert pts[0].scaling_efficiency == 1.0
