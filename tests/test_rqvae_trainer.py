"""RQ-VAE trainer e2e: scan-fused dispatch with boundary-exact cadence."""

import os

import numpy as np


def test_rqvae_trainer_fused_dispatch_e2e(tmp_path):
    """The fused multi-step loop must hit every log/eval/save boundary
    exactly (chunks shrink to land on them) and produce the artifact."""
    from genrec_tpu.trainers.rqvae_trainer import train

    res = train(iterations=10, num_warmup_steps=2, batch_size=256,
                steps_per_dispatch=4,         # 10 steps, boundaries at 3/6/9
                wandb_log_interval=3,
                do_eval=True, eval_every=3,   # epochs == steps here
                save_model_every=10 ** 6,
                dataset_type="synthetic",
                save_dir_root=str(tmp_path), wandb_logging=False, seed=0)
    assert 0.0 <= res["collision_rate"] <= 1.0
    assert os.path.exists(os.path.join(res["artifact_dir"], "rqvae.json"))
    assert res["sem_ids"].shape[1] == 3
    # metrics JSONL carries the boundary-step train logs (3, 6, 9) and the
    # eval entries — proof the chunking stopped on the exact steps
    logged = []
    with open(os.path.join(str(tmp_path), "metrics.jsonl")) as f:
        import json
        for line in f:
            rec = json.loads(line)
            if "train/loss" in rec:
                logged.append(rec["step"])
    assert logged == [3, 6, 9], logged
