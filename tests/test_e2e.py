"""End-to-end slice (BASELINE.json config 1 pattern): quantized model +
LoRA, N finetune steps with falling loss, greedy decode, resume — all
through the CLI driver on CPU."""

import json
import os

import numpy as np
import pytest

from qlora_tpu.cli import Args, train

pytestmark = pytest.mark.slow  # heavy compiles: run via -m slow in CI


def _write_alpaca(tmp_path, n=64):
    rows = [
        {"input": f"Repeat the word apple {i} times.", "output": "apple " * 3}
        for i in range(n)
    ]
    p = tmp_path / "data.json"
    p.write_text(json.dumps(rows))
    return str(p)


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    data = _write_alpaca(tmp)
    out = str(tmp / "out")
    args = Args(
        model_name_or_path="debug-neox",
        init_random=True,
        fake_tokenizer=True,
        dataset=data,
        output_dir=out,
        max_steps=10,
        per_device_train_batch_size=4,
        gradient_accumulation_steps=1,
        learning_rate=5e-3,
        lora_r=8,
        source_max_len=48,
        target_max_len=24,
        logging_steps=1,
        save_steps=5,
        group_by_length=True,
        do_train=True,
        do_eval=True,
        do_predict=True,
        eval_dataset_size=8,
        max_eval_samples=4,
        per_device_eval_batch_size=2,
        max_new_tokens=8,
        seed=0,
    )
    metrics = train(args)
    return out, metrics


def test_loss_decreases(run_dir):
    _, metrics = run_dir
    hist = metrics["train_metrics"]
    assert len(hist) == 10
    assert hist[-1]["loss"] < hist[0]["loss"], hist


def test_checkpoints_written(run_dir):
    out, _ = run_dir
    assert os.path.isdir(os.path.join(out, "checkpoint-5", "adapter_model"))
    assert os.path.isdir(os.path.join(out, "checkpoint-10", "adapter_model"))
    assert os.path.exists(os.path.join(out, "checkpoint-10", "optimizer_state.npz"))
    assert os.path.exists(os.path.join(out, "completed"))


def test_eval_and_predictions(run_dir):
    out, metrics = run_dir
    assert np.isfinite(metrics["eval_loss"])
    preds = [json.loads(l) for l in open(os.path.join(out, "predictions.jsonl"))]
    assert len(preds) >= 2
    assert all("prediction" in p for p in preds)


def test_metrics_json(run_dir):
    out, _ = run_dir
    m = json.load(open(os.path.join(out, "metrics.json")))
    assert "train_metrics" in m and "eval_loss" in m


def test_completed_run_skips_retrain(run_dir):
    out, _ = run_dir
    args = Args(
        model_name_or_path="debug-neox", init_random=True, fake_tokenizer=True,
        dataset="unused", output_dir=out, max_steps=10,
    )
    m2 = train(args)  # completed sentinel → no training attempted
    assert "train_metrics" not in m2


def test_strict_unknown_flag_errors():
    from qlora_tpu.cli import parse_args
    with pytest.raises(SystemExit):
        parse_args(["--definitely_not_a_flag", "1"])


def test_resume_from_checkpoint(tmp_path):
    data = _write_alpaca(tmp_path)
    out = str(tmp_path / "resume_out")
    base = dict(
        model_name_or_path="debug-neox", init_random=True, fake_tokenizer=True,
        dataset=data, output_dir=out, per_device_train_batch_size=2,
        gradient_accumulation_steps=1, lora_r=4, source_max_len=32,
        target_max_len=16, logging_steps=1, save_steps=3, group_by_length=False,
    )
    train(Args(max_steps=3, **base))
    # remove sentinel to simulate an interrupted longer run
    os.remove(os.path.join(out, "completed"))
    m = train(Args(max_steps=6, **base))
    steps = [h["step"] for h in m["train_metrics"]]
    assert steps == [4, 5, 6]  # resumed at 3, not restarted


def test_in_training_eval_and_mmlu(tmp_path):
    data = _write_alpaca(tmp_path, n=32)
    mmlu = tmp_path / "mmlu.json"
    mmlu.write_text(json.dumps([
        {"subject": "s", "input": "Which? Answer:", "output": "A"},
        {"subject": "s", "input": "Pick. Answer:", "output": "B"},
    ]))
    out = str(tmp_path / "out2")
    args = Args(
        model_name_or_path="debug-neox", init_random=True, fake_tokenizer=True,
        dataset=data, output_dir=out, max_steps=6,
        per_device_train_batch_size=2, gradient_accumulation_steps=1,
        lora_r=4, source_max_len=32, target_max_len=16, logging_steps=2,
        save_steps=100, group_by_length=False,
        do_eval=True, eval_dataset_size=4, max_eval_samples=4,
        per_device_eval_batch_size=2, eval_steps=3,
        do_mmlu_eval=True, mmlu_data_path=str(mmlu), mmlu_source_max_len=64,
    )
    m = train(args)
    assert "mmlu_eval_accuracy" in m
    log = [json.loads(l) for l in open(os.path.join(out, "train_log.jsonl"))]
    assert any("eval_loss" in r for r in log)      # in-training eval fired
    assert any("mmlu_eval_accuracy" in r for r in log)


def test_cli_mesh_training(tmp_path):
    # dp=2, tp=2 on the virtual 8-device CPU mesh through the CLI driver
    import jax as _jax
    if len(_jax.devices()) < 4:
        import pytest as _pytest
        _pytest.skip("needs 4 virtual devices")
    data = _write_alpaca(tmp_path, n=16)
    out = str(tmp_path / "mesh_out")
    args = Args(
        model_name_or_path="debug", init_random=True, fake_tokenizer=True,
        dataset=data, output_dir=out, max_steps=3,
        per_device_train_batch_size=4, gradient_accumulation_steps=1,
        lora_r=4, source_max_len=32, target_max_len=16, logging_steps=1,
        save_steps=100, group_by_length=False,
        mesh_dp=2, mesh_tp=2,
    )
    m = train(args)
    losses = [h["loss"] for h in m["train_metrics"]]
    assert len(losses) == 3 and all(np.isfinite(losses))


def test_cli_mesh_training_with_eval_and_mmlu(tmp_path):
    """VERDICT r2 #5: in-training eval + MMLU on MESH-trained (shard_map
    laid-out) state — _eval_pass/_run_mmlu consume the sharded trainable
    without resharding errors and produce finite metrics."""
    import jax as _jax
    if len(_jax.devices()) < 4:
        import pytest as _pytest
        _pytest.skip("needs 4 virtual devices")
    data = _write_alpaca(tmp_path, n=32)
    mmlu = tmp_path / "mmlu_mesh.json"
    mmlu.write_text(json.dumps([
        {"subject": "s", "input": "Which? Answer:", "output": "A"},
        {"subject": "s", "input": "Pick. Answer:", "output": "B"},
    ]))
    out = str(tmp_path / "mesh_eval_out")
    args = Args(
        model_name_or_path="debug", init_random=True, fake_tokenizer=True,
        dataset=data, output_dir=out, max_steps=4,
        per_device_train_batch_size=4, gradient_accumulation_steps=1,
        lora_r=4, source_max_len=32, target_max_len=16, logging_steps=1,
        save_steps=100, group_by_length=False,
        mesh_dp=2, mesh_tp=2,
        do_eval=True, eval_dataset_size=4, max_eval_samples=4,
        per_device_eval_batch_size=2, eval_steps=2,
        do_mmlu_eval=True, mmlu_data_path=str(mmlu), mmlu_source_max_len=64,
    )
    m = train(args)
    assert "mmlu_eval_accuracy" in m and np.isfinite(m["mmlu_eval_accuracy"])
    assert np.isfinite(m["eval_loss"])
    log = [json.loads(l) for l in open(os.path.join(out, "train_log.jsonl"))]
    assert any("eval_loss" in r for r in log)      # fired mid-training
    assert any("mmlu_eval_accuracy" in r for r in log)


def test_cli_mesh_training_megatron(tmp_path):
    # dp=2, tp=2 with the megatron tp style through the CLI driver
    import jax as _jax
    if len(_jax.devices()) < 4:
        import pytest as _pytest
        _pytest.skip("needs 4 virtual devices")
    data = _write_alpaca(tmp_path, n=16)
    out = str(tmp_path / "mesh_mega_out")
    args = Args(
        model_name_or_path="debug", init_random=True, fake_tokenizer=True,
        dataset=data, output_dir=out, max_steps=3,
        per_device_train_batch_size=4, gradient_accumulation_steps=1,
        lora_r=4, source_max_len=32, target_max_len=16, logging_steps=1,
        save_steps=100, group_by_length=False,
        mesh_dp=2, mesh_tp=2, tp_style="megatron",
    )
    m = train(args)
    losses = [h["loss"] for h in m["train_metrics"]]
    assert len(losses) == 3 and all(np.isfinite(losses))


def test_cli_mesh_training_sp(tmp_path):
    # dp=2, sp=2 (ring attention over the sequence) through the CLI driver
    import jax as _jax
    if len(_jax.devices()) < 4:
        import pytest as _pytest
        _pytest.skip("needs 4 virtual devices")
    data = _write_alpaca(tmp_path, n=16)
    out = str(tmp_path / "mesh_sp_out")
    args = Args(
        model_name_or_path="debug", init_random=True, fake_tokenizer=True,
        dataset=data, output_dir=out, max_steps=3,
        per_device_train_batch_size=4, gradient_accumulation_steps=1,
        lora_r=4, source_max_len=32, target_max_len=16, logging_steps=1,
        save_steps=100, group_by_length=False,
        mesh_dp=2, mesh_sp=2,
    )
    m = train(args)
    losses = [h["loss"] for h in m["train_metrics"]]
    assert len(losses) == 3 and all(np.isfinite(losses))


def test_cli_mesh_full_finetune(tmp_path):
    # GSPMD full finetune: dense params + optimizer state shard over
    # fsdp×tp, batch over dp, same train step partitioned by XLA
    import jax as _jax
    if len(_jax.devices()) < 8:
        import pytest as _pytest
        _pytest.skip("needs 8 virtual devices")
    data = _write_alpaca(tmp_path, n=16)
    out = str(tmp_path / "mesh_full_out")
    args = Args(
        model_name_or_path="debug", init_random=True, fake_tokenizer=True,
        dataset=data, output_dir=out, max_steps=3, full_finetune=True,
        bits=16, learning_rate=1e-4,
        per_device_train_batch_size=4, gradient_accumulation_steps=2,
        lora_r=4, source_max_len=32, target_max_len=16, logging_steps=1,
        save_steps=100, group_by_length=False,
        mesh_dp=2, mesh_fsdp=2, mesh_tp=2,
    )
    m = train(args)
    losses = [h["loss"] for h in m["train_metrics"]]
    assert len(losses) == 3 and all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_cli_mesh_full_finetune_resume(tmp_path):
    # resume must shard the RESTORED weights, not re-init (regression)
    import jax as _jax
    if len(_jax.devices()) < 4:
        import pytest as _pytest
        _pytest.skip("needs 4 virtual devices")
    data = _write_alpaca(tmp_path, n=16)
    out = str(tmp_path / "mesh_full_resume")
    base = dict(
        model_name_or_path="debug", init_random=True, fake_tokenizer=True,
        dataset=data, output_dir=out, full_finetune=True, bits=16,
        learning_rate=5e-4, per_device_train_batch_size=4,
        gradient_accumulation_steps=1, source_max_len=32, target_max_len=16,
        logging_steps=1, save_steps=2, group_by_length=False,
        mesh_dp=2, mesh_fsdp=2,
    )
    m1 = train(Args(max_steps=2, **base))
    l1 = [h["loss"] for h in m1["train_metrics"]]
    os.remove(os.path.join(out, "completed"))
    m2 = train(Args(max_steps=4, **base))
    steps = [h["step"] for h in m2["train_metrics"]]
    l2 = [h["loss"] for h in m2["train_metrics"]]
    assert steps == [3, 4]
    # restored weights continue falling from where step 2 left off — a
    # re-init would jump back to ~l1[0]
    assert l2[0] < l1[0], (l1, l2)


def test_resume_fast_forwards_data():
    from qlora_tpu.cli import _iter_batches
    from qlora_tpu.utils.testing import FakeTokenizer

    from qlora_tpu.train.collator import CausalCollator

    tok = FakeTokenizer()
    coll = CausalCollator(tok, source_max_len=16, target_max_len=8)
    exs = [{"input": f"q{i}", "output": f"a{i}"} for i in range(12)]
    a = _iter_batches(exs, coll, 2, 1, seed=7, group_by_length=False,
                      tokenizer=tok, max_len=24)
    full = [next(a) for _ in range(5)]
    coll2 = CausalCollator(tok, source_max_len=16, target_max_len=8)
    b = _iter_batches(exs, coll2, 2, 1, seed=7, group_by_length=False,
                      tokenizer=tok, max_len=24, skip_steps=3)
    resumed = [next(b) for _ in range(2)]
    for x, y in zip(full[3:], resumed):
        np.testing.assert_array_equal(x["input_ids"], y["input_ids"])


def test_iter_batches_accumulation_spans_epochs():
    """Partial accumulation groups carry across epoch boundaries (HF
    Trainer semantics).  Regression: the per-epoch group reset silently
    dropped those microbatches and SPUN FOREVER whenever accum exceeded
    the full batches per epoch (e.g. the reference default accum=16 on a
    32-example dataset)."""
    from qlora_tpu.cli import _iter_batches
    from qlora_tpu.train.collator import CausalCollator
    from qlora_tpu.utils.testing import FakeTokenizer

    tok = FakeTokenizer()
    coll = CausalCollator(tok, source_max_len=16, target_max_len=8)
    exs = [{"input": f"q{i}", "output": f"a{i}"} for i in range(8)]
    # 4 full batches/epoch, accum=16: one optimizer batch spans 4 epochs
    it = _iter_batches(exs, coll, 2, 16, seed=7, group_by_length=True,
                       tokenizer=tok, max_len=24)
    b = next(it)
    assert b["input_ids"].shape[0] == 16     # [accum, bs, S]
    # skip-based resume walks the identical plan
    coll2 = CausalCollator(tok, source_max_len=16, target_max_len=8)
    it2 = _iter_batches(exs, coll2, 2, 16, seed=7, group_by_length=True,
                        tokenizer=tok, max_len=24, skip_steps=1)
    b1 = next(it)
    r1 = next(it2)
    np.testing.assert_array_equal(b1["input_ids"], r1["input_ids"])


def test_iter_batches_raises_when_no_full_batch():
    from qlora_tpu.cli import _iter_batches
    from qlora_tpu.train.collator import CausalCollator
    from qlora_tpu.utils.testing import FakeTokenizer

    import pytest as _pytest

    tok = FakeTokenizer()
    coll = CausalCollator(tok, source_max_len=16, target_max_len=8)
    exs = [{"input": "q", "output": "a"}] * 3
    it = _iter_batches(exs, coll, 8, 1, seed=7, group_by_length=False,
                       tokenizer=tok, max_len=24)
    with _pytest.raises(ValueError, match="no full batch"):
        next(it)


def test_padded_batches_cover_all_examples():
    """Eval/predict batching covers EVERY example: the tail partial batch is
    padded to full size (static shapes) instead of dropped, and the pad
    rows' labels are masked so they contribute zero loss tokens
    (VERDICT r3 weak #8)."""
    import numpy as np

    from qlora_tpu.cli import _mask_pad_rows, _padded_batches

    ds = [{"i": i} for i in range(10)]
    chunks = list(_padded_batches(ds, 4))
    assert [n for _, n in chunks] == [4, 4, 2]
    assert all(len(c) == 4 for c, _ in chunks)
    # every real example appears exactly once across chunks[:n_real]
    seen = [e["i"] for c, n in chunks for e in c[:n]]
    assert seen == list(range(10))
    # pad rows repeat the last real example (valid model input)
    assert chunks[-1][0][2] == chunks[-1][0][1]

    batch = {"input_ids": np.ones((4, 8), np.int32),
             "labels": np.ones((4, 8), np.int32)}
    masked = _mask_pad_rows(batch, 2)
    assert (masked["labels"][2:] == -100).all()
    assert (masked["labels"][:2] == 1).all()
    assert (batch["labels"] == 1).all()  # caller's array untouched


def test_predict_int8_decode_impl(tmp_path):
    """--predict_decode_impl int8 routes trainer.predict's token loop
    through the offline int8 serving copy (exact prefill); predictions
    must be written for every example."""
    data = _write_alpaca(tmp_path, n=32)
    out = str(tmp_path / "out_i8")
    args = Args(
        model_name_or_path="debug-neox", init_random=True,
        fake_tokenizer=True, dataset=data, output_dir=out,
        max_steps=1, per_device_train_batch_size=4,
        gradient_accumulation_steps=1, learning_rate=5e-3, lora_r=4,
        source_max_len=48, target_max_len=24, do_train=True,
        do_eval=False, do_predict=True, eval_dataset_size=6,
        max_eval_samples=5, per_device_eval_batch_size=2,
        max_new_tokens=4, predict_decode_impl="int8", seed=0,
    )
    metrics = train(args)
    lines = open(metrics["predictions_path"]).read().splitlines()
    assert len(lines) == 5
    assert all("prediction" in json.loads(l) for l in lines)


def test_predict_speculative(tmp_path):
    """--predict_speculative k routes do_predict through batched
    prompt-lookup speculation; outputs must match the plain greedy path
    example-for-example (greedy-exact acceptance)."""
    data = _write_alpaca(tmp_path, n=32)

    def run(sub, **kw):
        out = str(tmp_path / sub)
        args = Args(
            model_name_or_path="debug-neox", init_random=True,
            fake_tokenizer=True, dataset=data, output_dir=out,
            max_steps=1, per_device_train_batch_size=4,
            gradient_accumulation_steps=1, learning_rate=5e-3, lora_r=4,
            source_max_len=48, target_max_len=24, do_train=True,
            do_eval=False, do_predict=True, eval_dataset_size=6,
            max_eval_samples=4, per_device_eval_batch_size=2,
            max_new_tokens=6, seed=0, **kw,
        )
        metrics = train(args)
        return [json.loads(l)["prediction"]
                for l in open(metrics["predictions_path"])]

    plain = run("out_plain")
    spec = run("out_spec", predict_speculative=4)
    assert len(spec) == 4
    assert plain == spec, (plain, spec)
