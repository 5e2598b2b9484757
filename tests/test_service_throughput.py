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
        assert pts[-1].mesh_shape == (n, 1)

    def test_foveated_dp_scaling(self):
        """foveated=True benches mode 2 through the same harness: the DP
        curve of the reference's throughput configuration (VERDICT r4
        item 5).  48x64 supports 5 levels, so fovea_level is lowered."""
        import jax
        from ug_stereomatcher_tpu.config import MatcherConfig
        from ug_stereomatcher_tpu.parallel import measure_throughput
        n = min(2, len(jax.devices()))
        cfg = MatcherConfig(fovea_level=3)
        pts = measure_throughput(height=48, width=64,
                                 device_counts=[1, n], repeats=1,
                                 cfg=cfg, foveated=True)
        assert pts[0].pairs_per_second > 0
        assert pts[-1].mesh_shape == (n, 1)
        with pytest.raises(ValueError, match="fovea_level"):
            measure_throughput(height=16, width=16, device_counts=[1],
                               foveated=True)

    def test_sp_mode_row_shards_one_pair(self):
        """'sp' points keep batch=1 and put every device on the rows axis
        (latency scaling of a single row-sharded pair)."""
        import jax
        from ug_stereomatcher_tpu.parallel import measure_throughput
        n = min(4, len(jax.devices()))
        pts = measure_throughput(height=96, width=64,
                                 device_counts=[1, n], repeats=1,
                                 mode="sp")
        assert [p.batch for p in pts] == [1, 1]
        assert pts[-1].mesh_shape == (1, n)
        assert pts[-1].pairs_per_second > 0

    def test_hybrid_mode_mesh_shape(self):
        import jax
        from ug_stereomatcher_tpu.parallel import measure_throughput
        if len(jax.devices()) < 4:
            pytest.skip("needs 4 devices")
        pts = measure_throughput(height=96, width=64,
                                 device_counts=[4], repeats=1,
                                 mode="hybrid")
        assert pts[0].mesh_shape == (2, 2)
        assert pts[0].batch == 2

    def test_hybrid_agrees_with_padded_dp_when_batch_lt_devices(self):
        """batch=2 on a 4-device mesh: the pairs-only matcher pads the
        batch to the axis size and slices back, the hybrid matcher
        row-shards each pair across its rows-group — two entirely
        different partitionings of the same work that must produce the
        same disparities (VERDICT r3 item 5; SURVEY.md §2.5 DP x SP
        composition).  The relative TIMING of the two layouts is a
        hardware property, not a correctness one — on this rig's virtual
        CPU mesh shard_map halo overhead beats any SP gain at every size
        measured (docs/PERF.md 'mesh-family scaling'), so the timing is
        recorded by BENCH_MODE=scaling, not asserted here."""
        import jax
        import jax.numpy as jnp
        from ug_stereomatcher_tpu.parallel.batch import make_batch_matcher
        from ug_stereomatcher_tpu.parallel.mesh import make_mesh
        if len(jax.devices()) < 4:
            pytest.skip("needs 4 devices")
        cfg = MatcherConfig()
        h, w = 128, 160
        rng = np.random.RandomState(0)
        # smooth scene: free-running outputs are chaotic under raw noise
        # (nearest warp flips gather indices on float fuzz — CLAUDE.md),
        # so cross-path comparisons use smooth inputs + quantile gates
        base = rng.rand(2, 3, h // 8, w // 8).astype(np.float32) * 255
        lb = jnp.asarray(np.kron(base, np.ones((1, 1, 8, 8), np.float32)))
        rb = jnp.roll(lb, 2, axis=-1)
        devs = jax.devices()[:4]

        dp = make_batch_matcher(cfg, h, w, make_mesh(4, 1, devices=devs))
        hyb = make_batch_matcher(cfg, h, w, make_mesh(2, 2, devices=devs))
        out_dp = np.asarray(dp(lb, rb))
        out_hyb = np.asarray(hyb(lb, rb))
        assert out_dp.shape == out_hyb.shape == (2, 3, h, w)
        d = np.abs(out_hyb - out_dp)
        assert np.median(d) < 0.05, np.median(d)
        assert (d > 0.5).mean() < 0.05, (d > 0.5).mean()
