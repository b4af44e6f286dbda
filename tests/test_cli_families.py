"""Driver-level e2e tests for the RandLA and ResGCN families.

`tests/test_cli_e2e.py` covers the PointNet family end-to-end; these
runs push the other two families' full CLI paths (train → checkpoint →
attack, with the family-specific data plumbing: RandLA's prepared
possibility-sampler inputs, ResGCN's dense blocks + targeted skip
gates) on the CPU mesh at tiny sizes.
"""

import os

import numpy as np
import pytest

from pointsecguard_tpu.data import make_synthetic_rooms, prepare_room


class TestRandlaCLI:
    @pytest.fixture(scope="class")
    def trained(self, tmp_path_factory):
        from pointsecguard_tpu.cli import train

        root = tmp_path_factory.mktemp("randla_e2e")
        data = str(root / "rooms")
        rd = str(root / "randla_input")
        orig = str(root / "original_ply")
        log = str(root / "log")
        make_synthetic_rooms(data, points_per_room=4000, seed=2)
        for f in sorted(os.listdir(data)):
            prepare_room(
                os.path.join(data, f), rd, sub_grid_size=0.2,
                original_dir=orig,
            )
        train.main([
            "--model", "randla", "--randla_dir", rd, "--log_dir", log,
            "--epochs", "4", "--randla_points", "512",
            "--steps_per_epoch", "8", "--batch_size", "2", "--seed", "0",
            "--val_steps", "4",
        ])
        return rd, orig, log

    def test_train_writes_checkpoints(self, trained):
        _, _, log = trained
        assert os.path.isdir(os.path.join(log, "checkpoints"))

    def test_train_auto_resumes(self, trained, capfd):
        """Re-running with a higher --epochs continues from the saved
        epoch instead of restarting at 0 (this loop was the last one
        without auto-resume; a restart's lower-step saves would be
        silently refused by orbax)."""
        from pointsecguard_tpu.cli import train

        rd, _, log = trained
        before = set(os.listdir(os.path.join(log, "checkpoints")))
        train.main([
            "--model", "randla", "--randla_dir", rd, "--log_dir", log,
            "--epochs", "5", "--randla_points", "512",
            "--steps_per_epoch", "8", "--batch_size", "2", "--seed",
            "0", "--val_steps", "4",
        ])
        # cli.train's basicConfig(force=True) evicts pytest's caplog
        # handler — read the stderr log stream instead
        assert "resumed from epoch" in capfd.readouterr().err
        after = set(os.listdir(os.path.join(log, "checkpoints")))
        assert before <= after  # resume only ADDS later-epoch saves

    def test_eval_save_preds_then_cv6fold(self, trained, tmp_path):
        """eval --save_preds writes full-resolution prediction PLYs that
        cv6fold aggregates against the prepared original_ply ground truth
        (`6_fold_cv.py:12` pipeline)."""
        from pointsecguard_tpu.cli import cv6fold
        from pointsecguard_tpu.cli import eval as eval_cli

        rd, orig, log = trained
        preds = str(tmp_path / "preds")
        eval_cli.main([
            "--model", "randla", "--randla_dir", rd, "--log_dir", log,
            "--randla_points", "512", "--num_clouds", "2",
            "--save_preds", preds, "--visual",
        ])
        assert os.listdir(preds)
        # --visual on the randla eval: per-cloud pred/gt dumps + HTML
        vis = os.listdir(os.path.join(log, "visual"))
        assert any(n.endswith("_pred.xyzrgb") for n in vis)
        assert any(n.endswith("_gt.xyzrgb") for n in vis)
        assert any(n.endswith("_pred.html") for n in vis)
        m = cv6fold.main([
            "--results_dir", preds, "--original_dir", orig,
        ])
        assert 0.0 <= float(m.miou) <= 1.0

    def test_nb_attack_cli(self, trained):
        from pointsecguard_tpu.cli import attack

        rd, _, log = trained
        cm, am = attack.main([
            "--model", "randla", "--attack", "nb", "--randla_dir", rd,
            "--log_dir", log, "--randla_points", "512", "--num_clouds", "2",
        ])
        tsv = os.path.join(log, "randla_nb_area5.tsv")
        rows = open(tsv).read().strip().splitlines()
        assert len(rows) >= 2  # header + >=1 cloud
        # the ares NB budget (eps=17 L2 on colors) saturates any cloud —
        # adversarial accuracy must not exceed clean
        assert float(am.accuracy) <= float(cm.accuracy)
        c = rows[1].split("\t")
        assert float(c[3]) > 0  # nonzero distortion

    def test_benchmark_cli_randla(self, trained):
        """cli.benchmark --model randla: the ares harness over whole
        sampled clouds — where the vendored ares actually lives (the
        fork nests it under RandLA-Net)."""
        from pointsecguard_tpu.cli import benchmark

        rd, _, log = trained
        acc, acc_adv, total, succ, dist = benchmark.main([
            "--mode", "attack", "--attack_name", "bim", "--goal", "ut",
            "--model", "randla", "--randla_dir", rd, "--log_dir", log,
            "--num_point", "512", "--batch_size", "2", "--max_blocks", "2",
            "--eps", "17.0", "--alpha", "1.7", "--iters", "3",
        ])
        assert acc.shape == acc_adv.shape == succ.shape == (2 * 512,)
        np.testing.assert_array_equal(succ, total & ~acc_adv)
        assert (dist > 0).all()

    def test_benchmark_randla_rejects_max_blocks_zero(self, trained):
        """The possibility sampler draws indefinitely — `--max_blocks 0`
        ("all") has no finite meaning on the randla path and must fail
        loudly instead of silently benchmarking a default count."""
        from pointsecguard_tpu.cli import benchmark

        rd, _, log = trained
        with pytest.raises(SystemExit, match="max_blocks"):
            benchmark.main([
                "--mode", "attack", "--attack_name", "bim", "--goal", "ut",
                "--model", "randla", "--randla_dir", rd, "--log_dir", log,
                "--num_point", "512", "--batch_size", "2",
                "--max_blocks", "0", "--eps", "17.0", "--alpha", "1.7",
                "--iters", "3",
            ])

    def test_benchmark_randla_rounds_up_to_full_batches(self, trained):
        """The sampler always yields full batches: `--max_blocks 3` at
        batch 2 must cover 4 clouds (round UP), never truncate to 2."""
        from pointsecguard_tpu.cli import benchmark

        rd, _, log = trained
        acc, acc_adv, total, succ, dist = benchmark.main([
            "--mode", "attack", "--attack_name", "bim", "--goal", "ut",
            "--model", "randla", "--randla_dir", rd, "--log_dir", log,
            "--num_point", "512", "--batch_size", "2", "--max_blocks", "3",
            "--eps", "17.0", "--alpha", "1.7", "--iters", "2",
        ])
        assert acc.shape == acc_adv.shape == succ.shape == (4 * 512,)

    def test_eval_batch_size_override(self, trained):
        """cli.eval --batch_size overrides the config's val_batch_size on
        the randla path (default 0 keeps the family default); --num_clouds
        counts sampled clouds, so B=1 × 2 clouds still scores."""
        from pointsecguard_tpu.cli import eval as eval_cli

        rd, _, log = trained
        m = eval_cli.main([
            "--model", "randla", "--randla_dir", rd, "--log_dir", log,
            "--randla_points", "512", "--num_clouds", "2",
            "--batch_size", "1",
        ])
        assert 0.0 <= float(m.miou) <= 1.0

    def test_random_noise_driver(self, trained):
        """`--attack random` runs the fixed-norm noise control as its own
        driver at the cloud level (the `sem_seg_dense/test.py:47-109`
        protocol; previously only block families accepted it)."""
        from pointsecguard_tpu.cli import attack

        rd, _, log = trained
        cm, am = attack.main([
            "--model", "randla", "--attack", "random", "--randla_dir", rd,
            "--log_dir", log, "--randla_points", "512", "--num_clouds", "2",
            "--noise_norm", "5.0",
        ])
        rows = [r.split("\t") for r in
                open(os.path.join(log, "randla_random_area5.tsv"))
                .read().strip().splitlines()[1:]]
        assert rows
        for r in rows:
            assert float(r[3]) == pytest.approx(5.0)  # l2 = --noise_norm
            assert int(r[5]) == 0  # no attack steps
        assert 0.0 <= float(am.accuracy) <= 1.0

    def test_save_adv_then_reevaluate(self, trained):
        """Cloud-level --save_adv → eval --adv_set round trip (same
        checkpoint ⇒ ADVSET accuracy reproduces the attack TSV's mean
        adv accuracy; clouds are equal-sized so the means coincide)."""
        from pointsecguard_tpu.cli import attack
        from pointsecguard_tpu.cli import eval as eval_cli

        rd, _, log = trained
        attack.main([
            "--model", "randla", "--attack", "nb", "--randla_dir", rd,
            "--log_dir", log, "--randla_points", "512", "--num_clouds", "2",
            "--save_adv",
        ])
        npz_path = os.path.join(log, "randla_nb_adv_area5.npz")
        z = np.load(npz_path)
        assert z["points"].shape[1:] == (512, 6)
        m = eval_cli.main([
            "--model", "randla", "--log_dir", log, "--adv_set", npz_path,
        ])
        tsv = os.path.join(log, "randla_nb_area5.tsv")
        rows = [r.split("\t") for r in
                open(tsv).read().strip().splitlines()[1:]]
        per_cloud_adv = np.mean([float(r[2]) for r in rows])
        assert abs(float(m.accuracy) - per_cloud_adv) < 1e-3

    def test_batched_attack_matches_single(self, trained, tmp_path):
        """--batch_size 2 attacks two clouds in one program; per-cloud
        TSV rows must match the B=1 run (same sampler seed ⇒ same cloud
        sequence; NB is fixed-steps + sign-based ⇒ per-cloud results are
        batch-independent)."""
        import shutil

        from pointsecguard_tpu.cli import attack

        rd, _, log = trained
        log1 = str(tmp_path / "b1")
        log2 = str(tmp_path / "b2")
        for dst in (log1, log2):
            shutil.copytree(os.path.join(log, "checkpoints"),
                            os.path.join(dst, "checkpoints"))
        base = [
            "--model", "randla", "--attack", "nb", "--randla_dir", rd,
            "--randla_points", "512", "--num_clouds", "2", "--seed", "3",
        ]
        attack.main(base + ["--log_dir", log1])
        attack.main(base + ["--log_dir", log2, "--batch_size", "2"])

        def rows(d):
            path = os.path.join(d, "randla_nb_area5.tsv")
            return [
                [float(x) for x in line.split("\t")[:5]]
                for line in open(path).read().strip().splitlines()[1:]
            ]

        # same sampler seed ⇒ same cloud sequence, written in the same
        # order by both runs (B=1: two batches; B=2: one batch, rows in
        # batch order)
        r1, r2 = rows(log1), rows(log2)
        assert len(r1) == len(r2) == 2
        for a, b in zip(r1, r2):
            # cloud, clean_acc, adv_acc, sr match; l2 only approximately:
            # the B=1 and B=2 programs compile differently, and ~1e-7
            # reduction-order noise in the gradient chaotically drifts
            # the 200-step trajectory's norm a few percent (the attack
            # outcome — the accuracies — is stable)
            np.testing.assert_allclose(a[:3] + a[4:], b[:3] + b[4:],
                                       atol=2e-3)
            np.testing.assert_allclose(a[3], b[3], rtol=0.1)

    def test_points_sharded_attack_matches_single(self, trained, tmp_path):
        """--shard_points 2 runs the SAME B=1 attack with the cloud's
        N-points axis sharded over a 1×2 data×points mesh (sequence
        parallelism — the only way multi-chip helps the RandLA protocol,
        whose batch is one cloud). GSPMD turns the pyramid's neighbor
        gathers and the backward's scatter-adds into cross-shard
        collectives; per-cloud TSV rows must match the unsharded run."""
        import shutil

        from pointsecguard_tpu.cli import attack

        rd, _, log = trained
        log1 = str(tmp_path / "sp1")
        log2 = str(tmp_path / "sp2")
        for dst in (log1, log2):
            shutil.copytree(os.path.join(log, "checkpoints"),
                            os.path.join(dst, "checkpoints"))
        base = [
            "--model", "randla", "--attack", "nb", "--randla_dir", rd,
            "--randla_points", "512", "--num_clouds", "2", "--seed", "3",
        ]
        attack.main(base + ["--log_dir", log1])
        attack.main(base + ["--log_dir", log2,
                            "--devices", "2", "--shard_points", "2"])

        def rows(d):
            path = os.path.join(d, "randla_nb_area5.tsv")
            return [
                [float(x) for x in line.split("\t")[:5]]
                for line in open(path).read().strip().splitlines()[1:]
            ]

        r1, r2 = rows(log1), rows(log2)
        assert len(r1) == len(r2) == 2
        for a, b in zip(r1, r2):
            # same tolerance rationale as the batched test: the sharded
            # program reassociates reductions (~1e-7 grad noise), which
            # drifts the trajectory's L2 slightly; accuracies are stable
            np.testing.assert_allclose(a[:3] + a[4:], b[:3] + b[4:],
                                       atol=2e-3)
            np.testing.assert_allclose(a[3], b[3], rtol=0.1)

    def test_random_with_control_is_noop(self, trained):
        """--attack random --control must not crash (the 'attack' IS the
        equal-norm noise; a round-3 review found the control column
        indexed a None rand_pred) — the flag is ignored with a log."""
        from pointsecguard_tpu.cli import attack

        rd, _, log = trained
        cm, am = attack.main([
            "--model", "randla", "--attack", "random", "--randla_dir", rd,
            "--log_dir", log, "--randla_points", "512",
            "--num_clouds", "1", "--noise_norm", "2.0", "--control",
        ])
        assert 0.0 <= float(am.accuracy) <= 1.0

    def test_visual_artifacts_randla(self, trained):
        """--visual on the RandLA driver writes per-cloud clean/adv/pred/
        gt .xyzrgb dumps and the HTML viewer (block-driver parity)."""
        from pointsecguard_tpu.cli import attack

        rd, _, log = trained
        attack.main([
            "--model", "randla", "--attack", "nb", "--randla_dir", rd,
            "--log_dir", log, "--randla_points", "512",
            "--num_clouds", "1", "--visual",
        ])
        vis = os.path.join(log, "visual")
        names = os.listdir(vis)
        for suffix in ("_raw.xyzrgb", "_adv_raw.xyzrgb", "_pred.xyzrgb",
                       "_gt.xyzrgb", "_adv.html"):
            assert any(n.endswith(suffix) for n in names), suffix
        xyzrgb = [n for n in names if n.endswith("_adv_raw.xyzrgb")][0]
        rows = np.loadtxt(os.path.join(vis, xyzrgb))
        assert rows.shape == (512, 6)

    def test_defended_attack_randla(self, trained):
        """--defense now wires into the RandLA driver too (the ares
        defenses ORIGINATE from this subtree, `ares/defense/`): the
        attack runs against the bit-depth-defended model and the
        protocol completes; EoT works with the randomized jitter."""
        from pointsecguard_tpu.cli import attack

        rd, _, log = trained
        base = [
            "--model", "randla", "--attack", "nb", "--randla_dir", rd,
            "--log_dir", log, "--randla_points", "512",
            "--num_clouds", "1",
        ]
        cm, am = attack.main(base + ["--defense", "bit_depth",
                                     "--defense_bits", "3"])
        assert 0.0 <= float(am.accuracy) <= 1.0
        cm2, am2 = attack.main(base + ["--defense", "jitter", "--eot", "2"])
        assert float(am2.accuracy) <= float(cm2.accuracy)

    def test_points_sharded_eval_matches_single(self, trained):
        """cli.eval --shard_points 2: the vote-pooled whole-cloud metrics
        of the sharded run must equal the unsharded run (forward only —
        results are deterministic up to reduction order, and the argmax
        votes are integer-stable at fixture scale)."""
        from pointsecguard_tpu.cli import eval as eval_cli

        rd, _, log = trained
        base = [
            "--model", "randla", "--randla_dir", rd, "--log_dir", log,
            "--randla_points", "512", "--num_clouds", "2", "--seed", "5",
        ]
        m1 = eval_cli.main(base)
        m2 = eval_cli.main(base + ["--devices", "2", "--shard_points", "2"])
        np.testing.assert_allclose(float(m1.accuracy), float(m2.accuracy),
                                   atol=1e-6)
        np.testing.assert_allclose(float(m1.miou), float(m2.miou),
                                   atol=1e-6)

    def test_batched_targeted_rejected(self, trained):
        from pointsecguard_tpu.cli import attack

        rd, _, log = trained
        with pytest.raises(SystemExit, match="batch_size 1"):
            attack.main([
                "--model", "randla", "--attack", "tar_nb",
                "--randla_dir", rd, "--log_dir", log,
                "--randla_points", "512", "--batch_size", "2",
            ])


class TestResgcnCLI:
    @pytest.fixture(scope="class")
    def trained(self, tmp_path_factory):
        from pointsecguard_tpu.cli import train

        root = tmp_path_factory.mktemp("resgcn_e2e")
        data = str(root / "rooms")
        log = str(root / "log")
        make_synthetic_rooms(data, points_per_room=3000, seed=3)
        train.main([
            "--model", "resgcn", "--data_root", data, "--log_dir", log,
            "--epochs", "1", "--npoint", "128", "--resgcn_blocks", "3",
            "--batch_size", "4", "--seed", "0",
        ])
        return data, log

    def test_train_writes_checkpoints(self, trained):
        _, log = trained
        assert os.path.isdir(os.path.join(log, "checkpoints"))

    def test_train_auto_resumes(self, trained):
        """Re-running train with a higher --epochs continues from the
        saved epoch (like `ckpt_util.py:27-86`) instead of restarting at
        0 — a restart's lower-step saves would be silently refused by
        orbax and the rerun would train from scratch for nothing."""
        from pointsecguard_tpu.cli import train

        data, log = trained
        train.main([
            "--model", "resgcn", "--data_root", data, "--log_dir", log,
            "--epochs", "2", "--npoint", "128", "--resgcn_blocks", "3",
            "--batch_size", "4", "--seed", "0",
        ])
        steps = sorted(
            int(d) for d in os.listdir(os.path.join(log, "checkpoints"))
            if d.isdigit()
        )
        assert steps[-1] == 2  # epoch-2 checkpoint from the resumed run

    def test_nb_attack_cli(self, trained):
        from pointsecguard_tpu.cli import attack

        data, log = trained
        clean_m, adv_m = attack.main([
            "--model", "resgcn", "--attack", "nb", "--data_root", data,
            "--log_dir", log, "--num_point", "128", "--resgcn_blocks", "3",
            "--batch_size", "1", "--max_blocks", "2",
        ])
        tsv = os.path.join(log, "resgcn_nb_area5.tsv")
        assert len(open(tsv).read().strip().splitlines()) >= 2
        assert float(adv_m.accuracy) <= float(clean_m.accuracy)

    def test_benchmark_cli_resgcn(self, trained):
        """cli.benchmark --model resgcn with the shared OptInit flags
        (the checkpoint is a 3-block model)."""
        from pointsecguard_tpu.cli import benchmark

        data, log = trained
        acc, acc_adv, total, succ, dist = benchmark.main([
            "--mode", "attack", "--attack_name", "bim", "--goal", "ut",
            "--model", "resgcn", "--data_root", data, "--log_dir", log,
            "--num_point", "128", "--resgcn_blocks", "3",
            "--batch_size", "2", "--max_blocks", "2",
            "--eps", "0.3", "--alpha", "0.05", "--iters", "3",
        ])
        assert acc.shape == succ.shape == (2 * 128,)
        np.testing.assert_array_equal(succ, total & ~acc_adv)
        assert (dist > 0).all()

    def test_tar_nb_gates_and_protocol(self, trained):
        """Targeted run exercises the reference skip gates (count<=500 &
        masked clean acc<0.5, `attacks.py:204-207,280-285`) — blocks are
        tiny so every block trips the count gate and is skipped, leaving
        an empty (header-only) TSV rather than an error."""
        from pointsecguard_tpu.cli import attack

        data, log = trained
        attack.main([
            "--model", "resgcn", "--attack", "tar_nb", "--data_root", data,
            "--log_dir", log, "--num_point", "128", "--resgcn_blocks", "3",
            "--batch_size", "1", "--max_blocks", "2",
            "--origin", "1", "--target", "7",
        ])
        tsv = os.path.join(log, "resgcn_tar_nb_area5.tsv")
        rows = open(tsv).read().strip().splitlines()
        assert rows[0].startswith("room")

    def test_eval_cli(self, trained):
        from pointsecguard_tpu.cli import eval as eval_cli

        data, log = trained
        total = eval_cli.main([
            "--model", "resgcn", "--data_root", data, "--log_dir", log,
            "--num_point", "128", "--resgcn_blocks", "3",
            "--batch_size", "4", "--num_votes", "1",
        ])
        assert np.isfinite(float(total.accuracy))
        assert 0.0 <= float(total.miou) <= 1.0

    def test_optinit_model_flags_roundtrip(self, trained, tmp_path):
        """The OptInit model flags (`config.py:40-57`: --kernel_size,
        --n_filters, --block, --conv, --epsilon) are CLI-drivable and
        consistent across train → eval → attack: a non-default MRConv
        dense-block model trains, restores and attacks with one flag
        set."""
        from pointsecguard_tpu.cli import attack, train
        from pointsecguard_tpu.cli import eval as eval_cli

        data, _ = trained
        log = str(tmp_path / "log")
        flags = [
            "--resgcn_blocks", "3", "--resgcn_k", "8",
            "--resgcn_filters", "32", "--resgcn_block_type", "dense",
            "--resgcn_conv", "mr",
        ]
        train.main([
            "--model", "resgcn", "--data_root", data, "--log_dir", log,
            "--epochs", "1", "--npoint", "128", "--batch_size", "4",
            "--seed", "0",
        ] + flags)
        m = eval_cli.main([
            "--model", "resgcn", "--data_root", data, "--log_dir", log,
            "--num_point", "128", "--batch_size", "4", "--num_votes", "1",
        ] + flags)
        assert 0.0 <= float(m.accuracy) <= 1.0
        cm, am = attack.main([
            "--model", "resgcn", "--attack", "nb", "--data_root", data,
            "--log_dir", log, "--num_point", "128", "--batch_size", "1",
            "--max_blocks", "2",
        ] + flags)
        assert float(am.accuracy) <= float(cm.accuracy) + 1e-6

    def test_tar_requires_bs1(self, trained):
        from pointsecguard_tpu.cli import attack

        data, log = trained
        with pytest.raises(SystemExit):
            attack.main([
                "--model", "resgcn", "--attack", "tar_nb",
                "--data_root", data, "--log_dir", log,
                "--batch_size", "2",
            ])

    def test_cross_family_adv_set_transfer(self, trained, tmp_path):
        """Cross-MODEL transferability: adversarial blocks crafted
        against a PointNet checkpoint re-evaluated under the ResGCN
        checkpoint (both consume 9-ch blocks). Exercises --save_adv →
        --adv_set across architectures; transfer strength is not
        asserted (not guaranteed), the mechanics and metric sanity are."""
        from pointsecguard_tpu.cli import attack, train
        from pointsecguard_tpu.cli import eval as eval_cli

        data, resgcn_log = trained
        pn_log = str(tmp_path / "pn_log")
        train.main([
            "--model", "pointnet", "--data_root", data, "--log_dir", pn_log,
            "--epochs", "2", "--npoint", "128", "--batch_size", "8",
            "--learning_rate", "0.003", "--eval_every", "10",
        ])
        attack.main([
            "--model", "pointnet", "--attack", "nb", "--data_root", data,
            "--log_dir", pn_log, "--num_point", "128", "--batch_size", "2",
            "--max_blocks", "4", "--save_adv",
        ])
        npz = os.path.join(pn_log, "pointnet_nb_adv_area5.npz")
        m = eval_cli.main([
            "--model", "resgcn", "--resgcn_blocks", "3",
            "--log_dir", resgcn_log, "--adv_set", npz, "--batch_size", "4",
        ])
        assert np.isfinite(float(m.accuracy))
        assert 0.0 <= float(m.miou) <= 1.0

    def test_fixed_graphs_attack_cli(self, trained):
        """--resgcn_fixed_graphs: edge graphs frozen at the clean input
        (documented deviation); the attack still degrades accuracy and
        writes the protocol TSV."""
        from pointsecguard_tpu.cli import attack

        data, log = trained
        clean_m, adv_m = attack.main([
            "--model", "resgcn", "--attack", "nb", "--data_root", data,
            "--log_dir", log, "--num_point", "128", "--resgcn_blocks", "3",
            "--batch_size", "1", "--max_blocks", "2",
            "--resgcn_fixed_graphs",
        ])
        assert float(adv_m.accuracy) <= float(clean_m.accuracy)


class TestRandlaOtherDatasets:
    """RandLA on the SemanticKITTI / Semantic3D preset + artifact trees
    (`helper_tool.py:18-100` configs; the reference ships these configs
    with no driver — drivable here via `--randla_dataset`)."""

    @pytest.fixture(scope="class")
    def kitti_tree(self, tmp_path_factory):
        from pointsecguard_tpu.data.other_datasets import (
            prepare_semantickitti_root,
        )

        root = tmp_path_factory.mktemp("kitti")
        raw = root / "sequences"
        rng = np.random.RandomState(3)
        for seq, labeled in (("00", True), ("08", True)):
            (raw / seq / "velodyne").mkdir(parents=True)
            if labeled:
                (raw / seq / "labels").mkdir()
            for i in range(2):
                (rng.rand(2000, 4).astype(np.float32) * 8).tofile(
                    str(raw / seq / "velodyne" / f"{i:06d}.bin")
                )
                sem = rng.choice([0, 10, 44, 252], 2000).astype(np.uint32)
                sem.tofile(str(raw / seq / "labels" / f"{i:06d}.label"))
        out = str(root / "sequences_sub")
        prepare_semantickitti_root(
            str(raw), out, {0: 0, 10: 1, 44: 2, 252: 3}, grid_size=0.3
        )
        return out

    def test_kitti_loader_splits(self, kitti_tree):
        from pointsecguard_tpu.data import SpatiallyRegularSampler

        tr = SpatiallyRegularSampler.load_semantickitti(
            kitti_tree, split="train", num_points=128
        )
        va = SpatiallyRegularSampler.load_semantickitti(
            kitti_tree, split="test", num_points=128
        )
        assert [c.name[:2] for c in tr.clouds] == ["00", "00"]
        assert [c.name[:2] for c in va.clouds] == ["08", "08"]
        assert all(c.colors is None for c in tr.clouds)
        xyz, feats, labels, _, _ = next(iter(tr.batches(2, 1)))
        assert feats.shape == (2, 128, 3)  # xyz-only features
        np.testing.assert_array_equal(feats, xyz)
        assert labels.max() <= 3

    @pytest.fixture(scope="class")
    def kitti_log(self, kitti_tree, tmp_path_factory):
        """Sub-scale KITTI train: 19-class head (label 0 ignored),
        xyz-only features, 4-layer pyramid — full CLI path."""
        from pointsecguard_tpu.cli import train

        log = str(tmp_path_factory.mktemp("kitti_log"))
        train.main([
            "--model", "randla", "--randla_dataset", "semantickitti",
            "--randla_dir", kitti_tree, "--log_dir", log,
            "--epochs", "2", "--randla_points", "256",
            "--steps_per_epoch", "2", "--batch_size", "2", "--seed", "0",
            "--val_steps", "1",
        ])
        return log

    def test_train_cli_semantickitti(self, kitti_log):
        assert os.path.isdir(os.path.join(kitti_log, "checkpoints"))

    def test_eval_cli_semantickitti(self, kitti_tree, kitti_log):
        """KITTI eval scores held-out seq-08 scans at sub resolution
        (its proj indices live per sequence for submission only, so the
        flat `<name>_proj.pkl` lookup falls back, like the fork's
        `evaluate:255-311`) in the 19-VALID-class space (raw label 0
        ignored, `RandLANet.py:103-124`)."""
        from pointsecguard_tpu.cli import eval as eval_cli

        m = eval_cli.main([
            "--model", "randla", "--randla_dataset", "semantickitti",
            "--randla_dir", kitti_tree, "--log_dir", kitti_log,
            "--randla_points", "256", "--num_clouds", "2",
            "--visual",
        ])
        assert np.asarray(m.class_iou).shape == (19,)
        assert 0.0 <= float(m.accuracy) <= 1.0
        # --visual on a 19-class dataset: the palette must extend past
        # the 13 S3DIS colors, and gt dumps must live in the same
        # REDUCED class space as the predictions (regression: this
        # used to IndexError on the first cloud)
        vis = os.path.join(kitti_log, "visual")
        dumps = sorted(os.listdir(vis))
        assert any(f.endswith("_pred.xyzrgb") for f in dumps)
        assert any(f.endswith("_gt.xyzrgb") for f in dumps)

    def test_adv_train_rejected_for_colorless_clouds(self, kitti_tree,
                                                     tmp_path):
        """KITTI scans are xyz-only; --adv_train perturbs color channels
        3:6 and would be a silent no-op that still pays the attack's
        fwd+bwd per step — must be rejected with a clear error."""
        from pointsecguard_tpu.cli import train

        with pytest.raises(SystemExit, match="xyz-only"):
            train.main([
                "--model", "randla", "--randla_dataset", "semantickitti",
                "--randla_dir", kitti_tree,
                "--log_dir", str(tmp_path / "log"),
                "--epochs", "1", "--randla_points", "256",
                "--steps_per_epoch", "1", "--batch_size", "2",
                "--val_steps", "1", "--adv_train", "nb",
            ])

    def test_semantic3d_loader(self, tmp_path):
        from pointsecguard_tpu.data import SpatiallyRegularSampler
        from pointsecguard_tpu.data.other_datasets import (
            prepare_semantic3d_root,
        )

        raw = tmp_path / "raw"
        raw.mkdir()
        rng = np.random.RandomState(5)
        for name, labeled in (
            ("bildstein_station3", True), ("domfountain1", True),
            ("testcloud", False),
        ):
            pc = np.concatenate(
                [rng.rand(600, 3) * 4, rng.rand(600, 1),
                 rng.randint(0, 255, (600, 3))], 1,
            )
            np.savetxt(str(raw / (name + ".txt")), pc, fmt="%.4f")
            if labeled:
                np.savetxt(str(raw / (name + ".labels")),
                           rng.randint(0, 9, 600), fmt="%d")
        out = tmp_path / "prepared"
        prepare_semantic3d_root(str(raw), str(out), first_grid=0.3,
                                final_grid=0.6)
        inp = str(out / "input_0.600")
        tr = SpatiallyRegularSampler.load_semantic3d(inp, split="train",
                                                     num_points=64)
        va = SpatiallyRegularSampler.load_semantic3d(inp, split="test",
                                                     num_points=64)
        # unlabeled test cloud skipped; val by name substring
        assert [c.name for c in tr.clouds] == ["domfountain1"]
        assert [c.name for c in va.clouds] == ["bildstein_station3"]
        _, feats, labels, _, _ = next(iter(tr.batches(1, 1)))
        assert feats.shape == (1, 64, 6)  # xyz + rgb
        assert 0 <= labels.min() and labels.max() <= 8


class TestSemantic3DEndToEnd:
    """`--randla_dataset semantic3d` on eval and attack: the model
    predicts over the 8 VALID classes while raw label 0 is ignored
    (`RandLANet.py:103-124` reducing_list semantics) — remapped labels,
    ignored points masked out of the attack objective and every metric."""

    @pytest.fixture(scope="class")
    def trained(self, tmp_path_factory):
        from pointsecguard_tpu.cli import train
        from pointsecguard_tpu.data.other_datasets import (
            prepare_semantic3d_root,
        )

        root = tmp_path_factory.mktemp("sem3d_e2e")
        raw = root / "raw"
        raw.mkdir()
        rng = np.random.RandomState(7)
        for name in ("bildstein_station3", "domfountain1"):
            pc = np.concatenate(
                [rng.rand(1500, 3) * 6, rng.rand(1500, 1),
                 rng.randint(0, 255, (1500, 3))], 1,
            )
            np.savetxt(str(raw / (name + ".txt")), pc, fmt="%.4f")
            np.savetxt(str(raw / (name + ".labels")),
                       rng.randint(0, 9, 1500), fmt="%d")
        out = root / "prepared"
        prepare_semantic3d_root(str(raw), str(out), first_grid=0.3,
                                final_grid=0.6)
        inp = str(out / "input_0.600")
        log = str(root / "log")
        train.main([
            "--model", "randla", "--randla_dataset", "semantic3d",
            "--randla_dir", inp, "--log_dir", log,
            "--epochs", "2", "--randla_points", "512",
            "--steps_per_epoch", "2", "--batch_size", "2", "--seed", "0",
            "--val_steps", "1",
        ])
        return inp, log

    def test_eval_8class(self, trained):
        from pointsecguard_tpu.cli import eval as eval_cli

        inp, log = trained
        m = eval_cli.main([
            "--model", "randla", "--randla_dataset", "semantic3d",
            "--randla_dir", inp, "--log_dir", log,
            "--randla_points", "512", "--num_clouds", "2",
        ])
        assert np.asarray(m.class_iou).shape == (8,)
        assert 0.0 <= float(m.accuracy) <= 1.0

    def test_nb_attack_masks_ignored(self, trained):
        from pointsecguard_tpu.cli import attack

        inp, log = trained
        cm, am = attack.main([
            "--model", "randla", "--attack", "nb",
            "--randla_dataset", "semantic3d", "--randla_dir", inp,
            "--log_dir", log, "--randla_points", "512",
            "--num_clouds", "1",
        ])
        # metrics live in the 8-valid-class space, never 13
        assert np.asarray(cm.class_iou).shape == (8,)
        assert float(am.accuracy) <= float(cm.accuracy)
        rows = open(
            os.path.join(log, "randla_nb_area5.tsv")
        ).read().strip().splitlines()
        assert len(rows) >= 2  # header + >=1 cloud

    def test_targeted_ignored_origin_rejected(self, trained):
        """--origin 0 is the ignored Semantic3D label — attacking it is
        meaningless (no logit exists for it) and must fail clearly."""
        from pointsecguard_tpu.cli import attack

        inp, log = trained
        with pytest.raises(SystemExit, match="valid raw"):
            attack.main([
                "--model", "randla", "--attack", "tar_nb",
                "--randla_dataset", "semantic3d", "--randla_dir", inp,
                "--log_dir", log, "--randla_points", "512",
                "--num_clouds", "1", "--origin", "0", "--target", "3",
            ])

    def test_attack_rejects_colorless_kitti(self, trained, tmp_path):
        """SemanticKITTI clouds are xyz-only: the color threat model
        does not apply and the attack driver must say so up front."""
        from pointsecguard_tpu.cli import attack

        _, log = trained
        with pytest.raises(SystemExit, match="xyz-only"):
            attack.main([
                "--model", "randla", "--attack", "nb",
                "--randla_dataset", "semantickitti",
                "--randla_dir", str(tmp_path), "--log_dir", log,
            ])
