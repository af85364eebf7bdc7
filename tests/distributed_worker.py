"""Worker process for the REAL multi-process test (test_multiprocess.py).

Each OS process initializes ``jax.distributed`` on the CPU backend (Gloo
collectives), runs ``do_train`` over the shared ('data','model') mesh, a
``gather_object`` round-trip, and sharded ``do_test`` — the exact code
paths the reference exercises with one NCCL process per GPU
(/root/reference/train.py:287-294, DDP :201-205, eval gather
os_coco_evaluation.py:163-169). Process 0 writes a JSON summary that the
test compares against a 1-process run of this same script.

Argv: pid nproc port dataset_root outdir local_devices mesh_data max_iter
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, root, outdir = sys.argv[3], sys.argv[4], sys.argv[5]
    local_devices, mesh_data, max_iter = map(int, sys.argv[6:9])

    import jax

    # CPU backend with N local virtual devices; must go through jax.config
    # (sitecustomize registers the TPU plugin before main reads env vars)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", local_devices)
    if nproc > 1:
        from openset_rcnn_tpu.parallel import initialize_distributed

        initialize_distributed(
            f"localhost:{port}", num_processes=nproc, process_id=pid
        )
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == local_devices * nproc

    import numpy as np

    from openset_rcnn_tpu.data.catalog import DatasetCatalog, MetadataCatalog

    CLASSES = ["c0", "c1", "c2", "unknown"]
    for name in ("synth_train", "synth_test"):
        with open(os.path.join(root, f"{name}.json")) as f:
            records = json.load(f)
        DatasetCatalog.register(name, lambda r=records: r)
        MetadataCatalog.get(name).update(
            evaluator_type="voc_records", thing_classes=CLASSES
        )

    from tests.test_e2e import make_cfg

    class _P:  # make_cfg expects a pathlib-ish tmp_path
        def __init__(self, base):
            self.base = base

        def __truediv__(self, other):
            return os.path.join(self.base, other)

    cfg = make_cfg(_P(outdir))
    cfg.OUTPUT_DIR = os.path.join(outdir, "out")
    cfg.SOLVER.IMS_PER_BATCH = 4
    cfg.SOLVER.MAX_ITER = max_iter
    cfg.SOLVER.CHECKPOINT_PERIOD = 0
    cfg.TPU.MESH_DATA = mesh_data
    cfg.TPU.MESH_MODEL = 1
    cfg.TPU.EVAL_BATCH_SIZE = 2
    cfg.DATALOADER.NUM_WORKERS = 2
    cfg.freeze()

    from openset_rcnn_tpu.engine.train_loop import (
        build_model_spec,
        build_module_and_params,
        do_test,
        do_train,
    )

    state = do_train(cfg)

    # explicit collective round-trip (comm.gather equivalent)
    from openset_rcnn_tpu.parallel import gather_object

    gathered = gather_object({"pid": pid, "tag": f"shard{pid}"})

    spec = build_model_spec(cfg)
    module, _ = build_module_and_params(cfg, spec)
    params = jax.tree.map(np.asarray, state.params)  # host copy per process
    results = do_test(cfg, module, params, spec)

    param_l1 = float(
        np.sum([np.sum(np.abs(l)) for l in jax.tree.leaves(params)])
    )

    if pid == 0:
        losses = {}
        with open(os.path.join(cfg.OUTPUT_DIR, "metrics.json")) as f:
            for line in f:
                rec = json.loads(line)
                if "total_loss" in rec:
                    losses[str(rec["iteration"])] = rec["total_loss"]
        summary = {
            "nproc": nproc,
            "devices": jax.device_count(),
            "step": int(state.step),
            "losses": losses,
            "param_l1": param_l1,
            "gathered": gathered,
            "results": {k: dict(v) for k, v in results.items()},
        }
        with open(os.path.join(outdir, "summary.json"), "w") as f:
            json.dump(summary, f)
    print(f"worker {pid}/{nproc} done", flush=True)


if __name__ == "__main__":
    main()
