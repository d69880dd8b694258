"""CLI + train/eval/predict driver — the qlora.py `train()` equivalent.

Flag surface mirrors the reference's four dataclasses
(/root/reference/qlora.py:78-246) with the same names and defaults, but
unknown flags are **errors** (the reference silently swallowed them via
``parse_args_into_dataclasses(return_remaining_strings=True)``,
qlora.py:693 — a footgun SURVEY.md flags for fixing).

Orchestration parity (qlora.py:688-838): resume detection → model build →
data module → train loop (logging/save cadence, MMLU callback) → eval →
predict (generate → predictions.jsonl) → metrics.json.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import logging
import os
import time
from typing import Optional

import numpy as np

logger = logging.getLogger("qlora_tpu")


@dataclasses.dataclass
class Args:
    # ModelArguments (qlora.py:78-90)
    model_name_or_path: str = "EleutherAI/pythia-12b"
    trust_remote_code: bool = False
    use_auth_token: bool = False
    # DataArguments (qlora.py:92-126)
    eval_dataset_size: int = 1024
    max_train_samples: Optional[int] = None
    max_eval_samples: Optional[int] = None
    source_max_len: int = 1024
    target_max_len: int = 256
    dataset: str = "alpaca"
    dataset_format: Optional[str] = None
    # TrainingArguments (qlora.py:128-214)
    output_dir: str = "./output"
    train_on_source: bool = False
    mmlu_split: str = "eval"
    mmlu_dataset: str = "mmlu-fs"
    do_mmlu_eval: bool = False
    max_mmlu_samples: Optional[int] = None
    mmlu_source_max_len: int = 2048
    full_finetune: bool = False
    adam8bit: bool = False
    double_quant: bool = True
    quant_type: str = "nf4"
    bits: int = 4
    lora_r: int = 64
    lora_alpha: float = 16.0
    lora_dropout: float = 0.0
    max_memory_MB: int = 80000
    report_to: str = "none"
    optim: str = "paged_adamw_32bit"
    per_device_train_batch_size: int = 1
    per_device_eval_batch_size: int = 1
    gradient_accumulation_steps: int = 16
    max_steps: int = 10000
    weight_decay: float = 0.0
    learning_rate: float = 2e-4
    max_grad_norm: float = 0.3
    gradient_checkpointing: bool = True
    # remat policy when gradient_checkpointing is on (transformer._remat_wrap):
    # "save_linear" keeps the MXU-heavy outputs (faster, more HBM);
    # "full" saves only layer boundaries (reference semantics, min memory)
    remat_policy: str = "save_linear"
    do_train: bool = True
    do_eval: bool = False
    do_predict: bool = False
    lr_scheduler_type: str = "constant"
    warmup_ratio: float = 0.03
    logging_steps: int = 10
    group_by_length: bool = True
    save_strategy: str = "steps"
    save_steps: int = 250
    save_total_limit: int = 40
    eval_steps: Optional[int] = None
    seed: int = 0
    predict_with_generate: bool = False
    # GenerationArguments (qlora.py:216-246)
    max_new_tokens: int = 256
    min_new_tokens: Optional[int] = None
    do_sample: bool = False
    num_beams: int = 1
    temperature: float = 1.0
    top_k: int = 50
    top_p: float = 1.0
    typical_p: float = 1.0
    repetition_penalty: float = 1.0
    no_repeat_ngram_size: int = 0
    length_penalty: float = 1.0
    diversity_penalty: float = 0.0
    num_beam_groups: int = 1
    penalty_alpha: Optional[float] = None
    use_cache: bool = True
    # TPU-native extension: route the predict token loop through the
    # offline int8 serving copy (greedy/sampled only; prefill stays exact)
    predict_decode_impl: Optional[str] = None
    # prompt-lookup speculative decoding for do_predict: draft length k
    # (0 = off).  Output-identical to the plain path (greedy-exact /
    # rejection-sampled); composes with predict_decode_impl="int8".
    predict_speculative: int = 0
    # reference-compat flags accepted for script parity (some are no-ops on
    # TPU — the trainer always runs bf16 compute, single in-process host)
    cache_dir: Optional[str] = None
    bf16: bool = True
    fp16: bool = False                         # unsupported: warns, uses bf16
    adam_beta2: float = 0.999
    data_seed: Optional[int] = None            # seed for the train/eval split
    evaluation_strategy: str = "steps"
    logging_strategy: str = "steps"
    dataloader_num_workers: int = 0
    remove_unused_columns: bool = False
    lora_modules: str = "all"                  # reference always targets all
    use_auth: bool = False
    # TPU-framework extensions (not in the reference)
    mmlu_data_path: Optional[str] = None      # path to zero/five-shot json
    init_random: bool = False                 # random weights (tests/bench)
    fake_tokenizer: bool = False              # byte tokenizer (tests)
    report_profile: bool = False              # jax.profiler trace of steps 5-10
    mesh_dp: int = 1
    mesh_fsdp: int = 1
    mesh_tp: int = 1
    # sequence/context parallel (ring attention over ICI); composes with
    # mesh_dp only — long-context training, activation memory scales S/sp
    mesh_sp: int = 1
    # page optimizer state to pinned host memory between steps (the
    # reference's paged_adamw semantics made explicit: HBM holds no
    # steady-state optimizer state; full-finetune memory lever)
    optim_host_offload: bool = False
    # "gather" = column-parallel every linear, all-gather outputs (works for
    # any mesh incl. fsdp); "megatron" = head-parallel attention +
    # row-parallel wo/w_down — 2 psums per block, requires fsdp=1
    tp_style: str = "gather"
    # multi-host process group (reference analog: torchrun env,
    # qlora.py:300-304); all three unset = single process / auto pod env
    coordinator_address: Optional[str] = None
    num_processes: Optional[int] = None
    process_id: Optional[int] = None


def _str2bool(v: str) -> bool:
    if isinstance(v, bool):
        return v
    if v.lower() in ("true", "1", "yes"):
        return True
    if v.lower() in ("false", "0", "no"):
        return False
    raise argparse.ArgumentTypeError(f"expected bool, got {v!r}")


def parse_args(argv=None) -> Args:
    p = argparse.ArgumentParser("qlora_tpu", allow_abbrev=False)
    for f in dataclasses.fields(Args):
        t = f.type
        opt = f"--{f.name}"
        if t in ("bool", bool):
            p.add_argument(opt, type=_str2bool, nargs="?", const=True,
                           default=f.default)
        elif t in ("Optional[int]",):
            p.add_argument(opt, type=int, default=f.default)
        elif t in ("Optional[str]",):
            p.add_argument(opt, type=str, default=f.default)
        elif t in ("int", int):
            p.add_argument(opt, type=int, default=f.default)
        elif t in ("float", float):
            p.add_argument(opt, type=float, default=f.default)
        else:
            p.add_argument(opt, type=str, default=f.default)
    ns = p.parse_args(argv)  # unknown flags → argparse error (strict)
    return Args(**vars(ns))


def build_model_and_tokenizer(args: Args):
    """get_accelerate_model equivalent (qlora.py:289-445)."""
    import jax

    from qlora_tpu.lora import LoraConfig
    from qlora_tpu.models import get_config, init_lora_params, init_params

    lcfg = LoraConfig(r=args.lora_r, alpha=args.lora_alpha,
                      dropout=args.lora_dropout)
    quantize_base = args.bits in (4, 8) and not args.full_finetune
    if args.bits not in (4, 8, 16, 32):
        raise ValueError(f"bits={args.bits} not supported (4, 8, 16, 32)")
    # --bits 8 → blockwise int8 base weights (reference qlora.py:314,317)
    quant_type = "int8" if args.bits == 8 else args.quant_type

    if not args.init_random and os.path.isdir(args.model_name_or_path):
        pre_quantized = os.path.exists(
            os.path.join(args.model_name_or_path, "qlora_tpu_config.json")
        )
        if pre_quantized:
            from qlora_tpu.utils.quantized_store import load_quantized

            params, cfg = load_quantized(args.model_name_or_path)
        else:
            from qlora_tpu.utils.hf_import import load_hf_model

            # mesh-divisible padding: intermediate + vocab round up to
            # 128 lanes × model shards (a mathematical no-op — forward
            # slices logits back; see hf_import docstrings)
            shards = max(args.mesh_fsdp * args.mesh_tp, 1)
            pad_to = 128 * shards if shards > 1 else None
            params, cfg = load_hf_model(
                args.model_name_or_path,
                quantize_base=quantize_base,
                quant_type=quant_type,
                double_quant=args.double_quant,
                pad_intermediate_to=pad_to,
                pad_vocab_to=pad_to,
            )
    else:
        cfg = get_config(args.model_name_or_path)
        params = init_params(
            jax.random.PRNGKey(args.seed), cfg, quantized=quantize_base,
            quant_type=quant_type,
        )

    if args.fake_tokenizer:
        from qlora_tpu.utils.testing import FakeTokenizer  # byte-level

        tokenizer = FakeTokenizer()
    else:
        from qlora_tpu.utils.tokenizer import load_tokenizer

        tokenizer, _ = load_tokenizer(args.model_name_or_path)

    lora = None
    if not args.full_finetune:
        lora = init_lora_params(jax.random.PRNGKey(args.seed + 1), cfg, lcfg)
    return params, lora, cfg, lcfg, tokenizer


def _iter_batches(examples, collator, batch_size, accum, seed, group_by_length,
                  tokenizer, max_len, skip_steps=0):
    """Yields stacked [accum, bs, S] batches forever (cycling epochs).

    skip_steps: fast-forward this many optimizer steps without collating —
    deterministic data-position resume (the per-epoch plan is a pure
    function of seed+epoch)."""
    from qlora_tpu.train.collator import bucket_batches, example_length

    epoch = 0
    to_skip = skip_steps
    # per-example lengths are epoch-invariant: tokenize ONCE per run, not
    # once per epoch (52k Alpaca examples × slow sentencepiece per epoch was
    # real host time on long runs — VERDICT r3 weak #7)
    lengths = ([example_length(tokenizer, e) for e in examples]
               if group_by_length else None)
    # bucket length → pending microbatches.  PERSISTS across epochs: a
    # partial accumulation group at an epoch boundary carries into the next
    # epoch (HF Trainer semantics).  The old per-epoch reset silently
    # dropped those microbatches — and spun FOREVER when accum exceeded the
    # full batches per epoch (nothing ever reached `accum`).
    groups: dict = {}
    while True:
        if group_by_length:
            buckets = [b for b in (64, 128, 256, 512, 1024, 2048, 4096) if b <= max_len]
            buckets = buckets or [max_len]
            if buckets[-1] != max_len:
                buckets.append(max_len)
            plan = bucket_batches(lengths, batch_size, buckets, seed=seed + epoch)
        else:
            rng = np.random.default_rng(seed + epoch)
            order = rng.permutation(len(examples))
            plan = [
                (order[i : i + batch_size].tolist(), max_len)
                for i in range(0, len(examples), batch_size)
            ]
        made_progress = False
        for idx, blen in plan:
            if len(idx) < batch_size:
                continue  # keep shapes static
            made_progress = True
            group = groups.setdefault(blen, [])
            if to_skip > 0:
                # count full accumulation groups without collating
                group.append(None)
                if len(group) == accum:
                    groups[blen] = []
                    to_skip -= 1
                continue
            collator.pad_to = blen
            group.append(collator([examples[i] for i in idx]))
            if len(group) == accum:
                out = {
                    k: np.stack([g[k] for g in group]) for k in group[0]
                }
                if accum == 1:
                    out = {k: v[0] for k, v in out.items()}
                yield out
                groups[blen] = []
        if not made_progress:
            raise ValueError(
                f"dataset yields no full batch: {len(examples)} examples < "
                f"per_device_train_batch_size={batch_size}")
        epoch += 1


def train(args: Args) -> dict:
    import jax
    import jax.numpy as jnp

    from qlora_tpu.train import (
        init_train_state, make_eval_step, make_optimizer, make_train_step,
    )
    from qlora_tpu.train.collator import CausalCollator
    from qlora_tpu.train.data import make_dataset
    from qlora_tpu.utils.checkpoint import (
        get_last_checkpoint, load_checkpoint, mark_completed, save_checkpoint,
    )

    if args.coordinator_address or (args.num_processes or 0) > 1:
        # multi-host process group (replaces torchrun env, qlora.py:300-304)
        from qlora_tpu.parallel import distributed

        distributed.initialize(
            args.coordinator_address, args.num_processes, args.process_id
        )
        logger.info(
            "distributed: process %d/%d, %d local / %d global devices",
            jax.process_index(), jax.process_count(),
            jax.local_device_count(), jax.device_count(),
        )

    os.makedirs(args.output_dir, exist_ok=True)
    all_metrics = {"run_name": args.output_dir}

    ckpt_dir, completed = get_last_checkpoint(args.output_dir)
    if completed:
        logger.info("training already completed; skipping")
        return all_metrics

    params, lora, cfg, lcfg, tokenizer = build_model_and_tokenizer(args)
    mode = "full" if args.full_finetune else "lora"
    trainable = params if args.full_finetune else lora

    from qlora_tpu.lora import count_lora_params

    n_train = count_lora_params(trainable)
    n_total = sum(x.size for x in jax.tree_util.tree_leaves(params)
                  if hasattr(x, "size"))
    logger.info(
        "trainable params: %d || all params: %d || trainable: %.4f%%",
        n_train, n_total, 100.0 * n_train / max(n_total, 1),
    )

    if args.fp16:
        logger.warning("fp16 unsupported on TPU; using bf16 compute "
                       "(the reference's own XPU path does the same)")
    opt_name = "adam8bit" if args.adam8bit else args.optim
    if (opt_name in ("adam8bit", "paged_adamw_8bit")
            and args.tp_style == "megatron" and args.mesh_tp > 1):
        # _opt_specs_like only matches adamw-family state leaves against the
        # tp-sharded trainable; blockwise-quantized 8-bit state would stay
        # replicated while grads are tp-local and fail at trace time
        raise ValueError(
            "adam8bit does not compose with tp_style=megatron "
            "(8-bit blockwise optimizer state cannot be suffix-matched to "
            "tp-sharded params); use tp_style=gather or a 32-bit optimizer")
    _any_mesh = args.mesh_dp * args.mesh_fsdp * args.mesh_tp * args.mesh_sp > 1
    optimizer = make_optimizer(
        opt_name, args.learning_rate, total_steps=args.max_steps,
        warmup_ratio=args.warmup_ratio, weight_decay=args.weight_decay,
        max_grad_norm=args.max_grad_norm, b2=args.adam_beta2,
        # on a mesh the inner optimizer stays unwrapped (device_put with a
        # memory kind is not expressible inside shard_map); paging happens
        # at the TrainState level after the step_fn is built below
        offload_state=args.optim_host_offload and not _any_mesh,
    )
    state = init_train_state(trainable, optimizer)
    start_step = 0
    if ckpt_dir is not None:
        loaded, opt_state, info = load_checkpoint(
            ckpt_dir, trainable, state.opt_state
        )
        state = state.replace(
            trainable=loaded,
            opt_state=opt_state if opt_state is not None else state.opt_state,
            step=jnp.asarray(info.get("step", 0), jnp.int32),
        )
        start_step = int(info.get("step", 0))
        logger.info("resumed from %s at step %d", ckpt_dir, start_step)

    collator = CausalCollator(
        tokenizer,
        source_max_len=args.source_max_len,
        target_max_len=args.target_max_len,
        train_on_source=args.train_on_source,
    )

    from qlora_tpu.utils.metrics import MetricsLogger, StepTimer, maybe_profile

    mlogger = MetricsLogger(args.output_dir, report_to=args.report_to)
    timer = StepTimer()
    metrics_hist = []
    data_seed = args.data_seed if args.data_seed is not None else 42
    if args.do_train and start_step < args.max_steps:
        train_ds, eval_ds = make_dataset(
            args.dataset,
            dataset_format=args.dataset_format,
            do_eval=args.do_eval or args.do_predict,
            eval_dataset_size=args.eval_dataset_size,
            max_train_samples=args.max_train_samples,
            max_eval_samples=args.max_eval_samples,
            seed=data_seed,
        )
        ckpt_opt_state = lambda st: st.opt_state
        if args.mesh_dp * args.mesh_fsdp * args.mesh_tp * args.mesh_sp > 1:
            # manual dp×fsdp×tp shard_map step: Pallas kernels run per-shard,
            # frozen weights shard over fsdp×tp, optimizer state over fsdp
            # (ZeRO-1), gradient accumulation via in-step scan
            import numpy as _np
            from jax.sharding import Mesh

            from jax.sharding import NamedSharding
            from qlora_tpu.parallel.sharded_step import (
                make_sharded_train_step,
                opt_state_full_to_zero1,
                opt_state_zero1_to_full,
                sharded_param_shardings,
                zero1_state_specs,
            )

            ndev = args.mesh_dp * args.mesh_fsdp * args.mesh_tp * args.mesh_sp
            if len(jax.devices()) < ndev:
                raise ValueError(
                    f"mesh {args.mesh_dp}x{args.mesh_fsdp}x{args.mesh_tp}"
                    f"x{args.mesh_sp} needs {ndev} devices, have "
                    f"{len(jax.devices())}"
                )
            if args.tp_style not in ("gather", "megatron"):
                raise ValueError(f"unknown tp_style {args.tp_style!r}")
            _full_mode = mode != "lora"
            _sp_mode = args.mesh_sp > 1 and not _full_mode
            _megatron = False
            if _full_mode:
                # GSPMD full finetune: dense bf16 params (full_finetune
                # forces bits=16) shard over fsdp×tp, optimizer state
                # follows the params, batch over dp — XLA partitions the
                # SAME single-device train step (no QLinears on this path,
                # so no Pallas partitioning constraint)
                if args.mesh_sp > 1:
                    raise NotImplementedError(
                        "full_finetune does not compose with mesh_sp")
                if args.tp_style == "megatron":
                    raise NotImplementedError(
                        "full_finetune shards via GSPMD (tp_style=gather)")
                from jax.sharding import PartitionSpec as _P

                from qlora_tpu.parallel.megatron_step import _opt_specs_like
                from qlora_tpu.parallel.mesh import (
                    MeshAxes as _MeshAxes, make_mesh as _make_mesh,
                    param_shardings as _param_shardings,
                )

                gmesh = _make_mesh(_MeshAxes(
                    dp=args.mesh_dp, fsdp=args.mesh_fsdp, tp=args.mesh_tp))
                # shard the (possibly checkpoint-RESTORED) trainable tree —
                # not the fresh init in `params` — so resume keeps weights
                shardings = _param_shardings(state.trainable, gmesh)
                tr_sharded = jax.tree_util.tree_map(
                    jax.device_put, state.trainable, shardings)
                pspecs = jax.tree_util.tree_map(
                    lambda s: s.spec, shardings,
                    is_leaf=lambda x: isinstance(x, NamedSharding))
                ospecs = _opt_specs_like(state.opt_state, tr_sharded, pspecs)
                opt_sharded = jax.tree_util.tree_map(
                    lambda x, s: jax.device_put(x, NamedSharding(gmesh, s)),
                    state.opt_state, ospecs,
                    is_leaf=lambda x: isinstance(x, _P))
                state = state.replace(trainable=tr_sharded,
                                      opt_state=opt_sharded)
                params = tr_sharded   # frozen arg is ignored in mode="full"
                base_fn = make_train_step(
                    cfg, lcfg, optimizer,
                    accum_steps=args.gradient_accumulation_steps,
                    donate=False, mode="full",
                )
                _bsh = NamedSharding(
                    gmesh,
                    _P("dp", None) if args.gradient_accumulation_steps == 1
                    else _P(None, "dp", None),
                )

                def step_fn(st, fr, b, r):
                    b = {k: jax.device_put(v, _bsh) for k, v in b.items()}
                    return base_fn(st, fr, b, r)
            elif _sp_mode:
                # sequence-parallel ring-attention training: the sequence
                # dim shards over sp, KV shards rotate via ppermute; fsdp/tp
                # weight sharding + ZeRO-1 compose (sp_step docstring)
                if args.mesh_tp > 1 and args.tp_style == "megatron":
                    raise ValueError(
                        "mesh_sp needs tp_style=gather (head-parallel "
                        "attention does not compose with the ring)")
                from qlora_tpu.parallel.sp_step import make_sp_train_step
                from qlora_tpu.train.loss import IGNORE_INDEX

                _wsh = args.mesh_fsdp > 1 or args.mesh_tp > 1
                if _wsh:
                    mesh_s = Mesh(
                        _np.asarray(jax.devices()[:ndev]).reshape(
                            args.mesh_dp, args.mesh_fsdp, args.mesh_tp,
                            args.mesh_sp),
                        ("dp", "fsdp", "tp", "sp"),
                    )
                    if args.mesh_fsdp > 1:
                        # ZeRO-1 over fsdp: flat-sharded optimizer state,
                        # portable checkpoints stay in the full layout
                        z = opt_state_full_to_zero1(
                            state.opt_state, state.trainable, optimizer,
                            args.mesh_fsdp)
                        z = jax.tree_util.tree_map(
                            lambda x, s: jax.device_put(
                                x, NamedSharding(mesh_s, s)),
                            z, zero1_state_specs(z),
                        )
                        state = state.replace(opt_state=z)
                        ckpt_opt_state = lambda st: opt_state_zero1_to_full(
                            st.opt_state, st.trainable, optimizer
                        )
                    params = jax.tree_util.tree_map(
                        jax.device_put, params,
                        sharded_param_shardings(params, mesh_s)
                    )
                else:
                    mesh_s = Mesh(
                        _np.asarray(jax.devices()[:ndev]).reshape(
                            args.mesh_dp, args.mesh_sp),
                        ("dp", "sp"),
                    )
                sp_fn = make_sp_train_step(
                    cfg, lcfg, optimizer, mesh_s, params, state,
                    accum_steps=args.gradient_accumulation_steps,
                    clip_norm=args.max_grad_norm, donate=False,
                    remat=(args.remat_policy if args.gradient_checkpointing
                           else False))
                _spn = args.mesh_sp

                def step_fn(st, fr, b, r):
                    ids, labels = b["input_ids"], b["labels"]
                    pad = (-ids.shape[-1]) % _spn
                    if pad:
                        # ring shards need S % sp == 0; right pads sit after
                        # every real token (causal ⇒ exact) and are loss-masked
                        widths = [(0, 0)] * (ids.ndim - 1) + [(0, pad)]
                        ids = jnp.pad(ids, widths)
                        labels = jnp.pad(labels, widths,
                                         constant_values=IGNORE_INDEX)
                    return sp_fn(st, fr,
                                 {"input_ids": ids, "labels": labels}, r)
            elif args.tp_style == "megatron":
                # head-parallel attention + row-parallel projections: 2 psums
                # per block, tp-sharded LoRA/optimizer state
                if args.mesh_fsdp > 1:
                    raise ValueError(
                        "tp_style=megatron requires mesh_fsdp=1 "
                        "(compose fsdp via tp_style=gather)")
                from qlora_tpu.parallel.megatron_step import (
                    _opt_specs_like,
                    make_megatron_train_step,
                    megatron_lora_specs,
                    megatron_param_specs,
                    requantize_row_parallel,
                )

                mesh_m = Mesh(
                    _np.asarray(jax.devices()[:ndev]).reshape(
                        args.mesh_dp, args.mesh_tp),
                    ("dp", "tp"),
                )
                params = requantize_row_parallel(params, args.mesh_tp)

                def _put(tree, specs):
                    from jax.sharding import PartitionSpec as _P
                    return jax.tree_util.tree_map(
                        lambda x, s: jax.device_put(
                            x, NamedSharding(mesh_m, s)),
                        tree, specs, is_leaf=lambda x: isinstance(x, _P),
                    )

                lspecs = megatron_lora_specs(state.trainable)
                ospecs = _opt_specs_like(
                    state.opt_state, state.trainable, lspecs)
                state = state.replace(
                    trainable=_put(state.trainable, lspecs),
                    opt_state=_put(state.opt_state, ospecs),
                )
                params = _put(params, megatron_param_specs(params))
                sh_fn = make_megatron_train_step(
                    cfg, lcfg, optimizer, mesh_m, params, state,
                    accum_steps=args.gradient_accumulation_steps,
                    clip_norm=args.max_grad_norm, donate=False,
                    remat=(args.remat_policy if args.gradient_checkpointing
                           else False),
                )
                step_fn = lambda st, fr, b, r: sh_fn(st, fr, b, r)
                # skip the gather-style setup below
                _megatron = True
            _gather = not (_full_mode or _sp_mode or _megatron)
            if _gather:
                mesh = Mesh(
                    _np.asarray(jax.devices()[:ndev]).reshape(
                        args.mesh_dp, args.mesh_fsdp, args.mesh_tp
                    ),
                    ("dp", "fsdp", "tp"),
                )
            if _gather and args.mesh_fsdp > 1:
                # ZeRO-1: convert the (fresh or checkpoint-restored) full
                # opt state to the flat fsdp-sharded layout
                z = opt_state_full_to_zero1(
                    state.opt_state, state.trainable, optimizer, args.mesh_fsdp
                )
                z = jax.tree_util.tree_map(
                    lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
                    z, zero1_state_specs(z),
                )
                state = state.replace(opt_state=z)
                # checkpoints stay portable: saved in the full layout
                ckpt_opt_state = lambda st: opt_state_zero1_to_full(
                    st.opt_state, st.trainable, optimizer
                )
            if _gather:
                params = jax.tree_util.tree_map(
                    jax.device_put, params,
                    sharded_param_shardings(params, mesh)
                )
                sh_fn = make_sharded_train_step(
                    cfg, lcfg, optimizer, mesh, params, state,
                    accum_steps=args.gradient_accumulation_steps,
                    clip_norm=args.max_grad_norm, donate=False,
                    remat=(args.remat_policy if args.gradient_checkpointing
                           else False),
                )
                step_fn = lambda st, fr, b, r: sh_fn(st, fr, b, r)
            if args.optim_host_offload:
                # mesh-composed paged optimizer: opt state parks in
                # pinned_host between steps, each device paging its own
                # shard (ZeRO-1 chunk / GSPMD shard / tp shard) — the
                # reference's paged AdamW was orthogonal to parallelism
                # (qlora.py:198) and so is this
                from qlora_tpu.train.optimizer import (
                    page_state_between_steps, tree_to_memory_kind)

                state = state.replace(opt_state=tree_to_memory_kind(
                    state.opt_state, "pinned_host"))
                step_fn = page_state_between_steps(step_fn)
                _hbm_ckpt = ckpt_opt_state
                # checkpoint conversions (zero1→full etc.) run jnp ops:
                # bring the state back to device memory first
                ckpt_opt_state = lambda st: _hbm_ckpt(st.replace(
                    opt_state=tree_to_memory_kind(st.opt_state, "device")))
        else:
            step_fn = make_train_step(
                cfg, lcfg, optimizer,
                accum_steps=args.gradient_accumulation_steps,
                donate=False, mode=mode,
                remat=(args.remat_policy if args.gradient_checkpointing
                       else False),
            )
        eval_fn = make_eval_step(cfg, lcfg, mode=mode) if (
            args.do_eval and eval_ds
        ) else None
        max_len = args.source_max_len + args.target_max_len
        batches = _iter_batches(
            train_ds, collator, args.per_device_train_batch_size,
            args.gradient_accumulation_steps, args.seed,
            args.group_by_length, tokenizer, max_len,
            skip_steps=start_step,
        )
        rng = jax.random.PRNGKey(args.seed)
        t0 = time.time()
        for step in range(start_step, args.max_steps):
            profiling = args.report_profile and step == start_step + 5
            with maybe_profile(args.output_dir, profiling):
                timer.tick()
                batch = next(batches)
                batch = {k: jnp.asarray(v) for k, v in batch.items()}
                rng, sub = jax.random.split(rng)
                state, m = step_fn(state, params, batch, sub)
                jax.block_until_ready(m["loss"]) if profiling else None
                timer.tock()
            if (step + 1) % args.logging_steps == 0:
                loss = float(m["loss"])
                dt = (time.time() - t0) / args.logging_steps
                logger.info("step %d: loss %.4f (%.2fs/step)", step + 1, loss, dt)
                row = {"step": step + 1, "loss": loss, "seconds_per_step": dt,
                       "grad_norm": float(m["grad_norm"])}
                metrics_hist.append(row)
                mlogger.log(row, step=step + 1)
                t0 = time.time()
            if args.save_strategy == "steps" and (step + 1) % args.save_steps == 0:
                save_checkpoint(args.output_dir, step + 1, state.trainable,
                                ckpt_opt_state(state))
                _prune_checkpoints(args.output_dir, args.save_total_limit)
            if args.eval_steps and (step + 1) % args.eval_steps == 0:
                # in-training eval cadence (reference: evaluation_strategy
                # steps + MMLUEvalCallback.on_evaluate)
                if eval_fn is not None:
                    ev_loss = _eval_pass(args, eval_fn, state, params, collator,
                                         eval_ds)
                    logger.info("step %d: eval_loss %.4f", step + 1, ev_loss)
                    mlogger.log({"eval_loss": ev_loss}, step=step + 1)
                if args.do_mmlu_eval:
                    res = _run_mmlu(args, params, state, cfg, lcfg,
                                    tokenizer, mode)
                    all_metrics.update(res)
                    mlogger.log(
                        {k: v for k, v in res.items()
                         if k in ("mmlu_loss", "mmlu_eval_accuracy")},
                        step=step + 1,
                    )
        save_checkpoint(args.output_dir, args.max_steps, state.trainable,
                        ckpt_opt_state(state))
        mark_completed(args.output_dir)
        all_metrics["train_metrics"] = metrics_hist

    if args.do_eval:
        _, eval_ds = make_dataset(
            args.dataset, dataset_format=args.dataset_format, do_eval=True,
            eval_dataset_size=args.eval_dataset_size,
            max_eval_samples=args.max_eval_samples, seed=data_seed,
        )
        ev = make_eval_step(cfg, lcfg, mode=mode)
        tot, n_tot = 0.0, 0
        bs = max(args.per_device_eval_batch_size, 1)
        for chunk, n_real in _padded_batches(eval_ds, bs):
            collator.pad_to = args.source_max_len + args.target_max_len
            b = _mask_pad_rows(collator(chunk), n_real)
            b = {k: jnp.asarray(v) for k, v in b.items()}
            loss, n = ev(state.trainable, params, b)
            tot += float(loss) * int(n)
            n_tot += int(n)
        all_metrics["eval_loss"] = tot / max(n_tot, 1)
        logger.info("eval_loss: %.4f", all_metrics["eval_loss"])

    if args.do_mmlu_eval and not args.do_train:
        # standalone MMLU eval (training runs it on its own cadence);
        # _resolve_mmlu_path falls back to the bundled data/mmlu files
        all_metrics.update(
            _run_mmlu(args, params, state, cfg, lcfg, tokenizer, mode)
        )

    if args.do_predict:
        all_metrics.update(
            _run_predict(args, params, state, cfg, lcfg, tokenizer, collator, mode)
        )

    if timer.times:
        all_metrics["seconds_per_step_mean"] = timer.mean
    mlogger.close()
    with open(os.path.join(args.output_dir, "metrics.json"), "w") as f:
        json.dump(all_metrics, f, indent=2)
    return all_metrics


def _padded_batches(ds, bs):
    """Yield (chunk, n_real) covering EVERY example: the final partial batch
    is padded to bs by repeating its last example (shapes stay static) and
    n_real marks the genuine rows.  Fixes the old ``range(0, len - bs + 1)``
    loops that silently dropped up to bs-1 tail examples from eval_loss and
    predictions.jsonl."""
    for i in range(0, len(ds), bs):
        chunk = list(ds[i : i + bs])
        n_real = len(chunk)
        if n_real < bs:
            chunk = chunk + [chunk[-1]] * (bs - n_real)
        yield chunk, n_real


def _mask_pad_rows(batch: dict, n_real: int) -> dict:
    """Zero the padded rows' loss contribution: labels −100 everywhere means
    the eval step counts 0 valid tokens for those rows (exact)."""
    if n_real < batch["labels"].shape[0]:
        batch = dict(batch)
        labels = batch["labels"].copy()
        labels[n_real:] = -100
        batch["labels"] = labels
    return batch


def _eval_pass(args, eval_fn, state, params, collator, eval_ds) -> float:
    import jax.numpy as jnp

    bs = max(args.per_device_eval_batch_size, 1)
    tot, n_tot = 0.0, 0
    save_pad = collator.pad_to
    collator.pad_to = args.source_max_len + args.target_max_len
    for chunk, n_real in _padded_batches(eval_ds, bs):
        raw = _mask_pad_rows(collator(chunk), n_real)
        b = {k: jnp.asarray(v) for k, v in raw.items()}
        loss, n = eval_fn(state.trainable, params, b)
        tot += float(loss) * int(n)
        n_tot += int(n)
    collator.pad_to = save_pad
    return tot / max(n_tot, 1)


# bundled MMLU files that are NOT the canonical splits (data/mmlu/README.md):
# the five-shot files derive their shots from val records instead of the
# official dev split, and the test files are odd-indexed val stand-ins.
_MMLU_DERIVED = {
    "five_shot_mmlu_val.json",
    "zero_shot_mmlu_test.json",
    "five_shot_mmlu_test.json",
}


def _resolve_mmlu_path(args) -> Optional[str]:
    """--mmlu_dataset mmlu-zs|mmlu-fs + --mmlu_split eval|test → data file
    (reference path scheme, qlora.py:722-733); explicit --mmlu_data_path wins."""
    if args.mmlu_data_path:
        return args.mmlu_data_path
    tag = "zero_shot" if args.mmlu_dataset == "mmlu-zs" else "five_shot"
    split = "val" if args.mmlu_split in ("eval", "val") else "test"
    fname = f"{tag}_mmlu_{split}.json"
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for cand in (
        os.path.join("data", "mmlu", fname),             # cwd-relative
        os.path.join(repo_root, "data", "mmlu", fname),  # bundled
    ):
        if os.path.exists(cand):
            # scripts/get_mmlu_data.py stamps CANONICAL next to files it
            # fetched from the hub; absent that, the bundled derived files
            # produce numbers that are NOT paper-comparable — say so loudly
            stamp = os.path.join(os.path.dirname(cand), "CANONICAL")
            canonical = set()
            if os.path.exists(stamp):
                with open(stamp) as f:
                    canonical = {ln.strip() for ln in f}
            if fname in _MMLU_DERIVED and fname not in canonical:
                logger.warning(
                    "MMLU data %s is a bundled DERIVED split (shots/records "
                    "re-derived from the val file, data/mmlu/README.md): "
                    "accuracies are self-consistent but NOT comparable to "
                    "published MMLU numbers. Build the canonical splits "
                    "OFFLINE from the official data.tar with "
                    "scripts/get_mmlu_data.py --from_tar PATH (or "
                    "--from_hub with network).", cand,
                )
            return cand
    return None


def _prune_checkpoints(output_dir: str, keep: int):
    """save_total_limit semantics: delete oldest checkpoint dirs beyond keep."""
    import re
    import shutil

    if not keep or keep <= 0:
        return
    ckpts = []
    for name in os.listdir(output_dir):
        m = re.fullmatch(r"checkpoint-(\d+)", name)
        if m:
            ckpts.append((int(m.group(1)), name))
    for _, name in sorted(ckpts)[:-keep]:
        shutil.rmtree(os.path.join(output_dir, name), ignore_errors=True)


def _run_mmlu(args, params, state, cfg, lcfg, tokenizer, mode):
    from qlora_tpu.eval import evaluate_mmlu, load_mmlu_file

    path = _resolve_mmlu_path(args)
    if not path:
        logger.warning(
            "do_mmlu_eval set but no MMLU data found (--mmlu_data_path or "
            "data/mmlu/, see scripts/get_mmlu_data.py); skipping"
        )
        return {}
    examples = load_mmlu_file(path, args.max_mmlu_samples)
    lora = state.trainable if mode == "lora" else None
    base = params if mode == "lora" else state.trainable
    res = evaluate_mmlu(
        base, lora, cfg, tokenizer, examples, lcfg=lcfg,
        batch_size=max(args.per_device_eval_batch_size, 1),
        source_max_len=args.mmlu_source_max_len,
    )
    logger.info("MMLU accuracy: %.4f", res.get("mmlu_eval_accuracy", 0.0))
    return res


def _run_predict(args, params, state, cfg, lcfg, tokenizer, collator, mode):
    import jax
    import jax.numpy as jnp

    from qlora_tpu.generate import SamplingParams, generate
    from qlora_tpu.train.data import make_dataset

    _, predict_ds = make_dataset(
        args.dataset, dataset_format=args.dataset_format, do_eval=True,
        eval_dataset_size=args.eval_dataset_size,
        max_eval_samples=args.max_eval_samples, seed=42,
    )
    collator.predict_with_generate = True
    collator.pad_to = args.source_max_len
    sp = SamplingParams(
        do_sample=args.do_sample, temperature=args.temperature,
        top_k=args.top_k, top_p=args.top_p, typical_p=args.typical_p,
        repetition_penalty=args.repetition_penalty,
        no_repeat_ngram_size=args.no_repeat_ngram_size,
    )
    lora = state.trainable if mode == "lora" else None
    base = params if mode == "lora" else state.trainable
    decode_params = None
    if args.predict_decode_impl == "int8":
        # serving copy built once, reused across predict batches
        from qlora_tpu.generate.serve_int8 import (
            requantize_params_int8_unstacked,
        )

        decode_params = requantize_params_int8_unstacked(base)
    spec_k = int(args.predict_speculative or 0)
    if spec_k > 0:
        if args.num_beams > 1 or args.penalty_alpha or args.min_new_tokens:
            raise ValueError(
                "--predict_speculative composes with greedy/sampled "
                "decoding only (not beams/contrastive/min_new_tokens)")
        from qlora_tpu.generate.speculative import generate_speculative
    bs = max(args.per_device_eval_batch_size, 1)
    out_path = os.path.join(args.output_dir, "predictions.jsonl")
    with open(out_path, "w") as f:
        for chunk, n_real in _padded_batches(predict_ds, bs):
            b = collator(chunk)
            ids = jnp.asarray(b["input_ids"])
            lengths = jnp.asarray(b["attention_mask"].sum(-1))
            if spec_k > 0:
                # batched prompt-lookup speculation: identical outputs to
                # the plain path (greedy-exact / rejection-sampled), up to
                # draft_len+1 tokens per weight pass
                toks = generate_speculative(
                    base, lora, ids, lengths, cfg, lcfg,
                    max_new_tokens=args.max_new_tokens,
                    eos_id=tokenizer.eos_token_id, draft_len=spec_k,
                    decode_impl=args.predict_decode_impl,
                    decode_params=decode_params,
                    sparams=sp, rng=jax.random.PRNGKey(args.seed),
                )
            else:
                toks = generate(
                    base, lora, ids, lengths, cfg, lcfg,
                    max_new_tokens=args.max_new_tokens,
                    min_new_tokens=args.min_new_tokens or 0,
                    num_beams=args.num_beams,
                    length_penalty=args.length_penalty,
                    num_beam_groups=args.num_beam_groups,
                    diversity_penalty=args.diversity_penalty,
                    penalty_alpha=args.penalty_alpha,
                    eos_id=tokenizer.eos_token_id, sparams=sp,
                    rng=jax.random.PRNGKey(args.seed),
                    decode_impl=args.predict_decode_impl,
                    decode_params=decode_params,
                )
            for ex, row in zip(chunk[:n_real], np.asarray(toks)[:n_real]):
                text = tokenizer.decode(
                    [t for t in row.tolist() if t != tokenizer.eos_token_id]
                )
                f.write(json.dumps({**ex, "prediction": text}) + "\n")
    logger.info("wrote %s", out_path)
    return {"predictions_path": out_path}


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    args = parse_args(argv)
    return train(args)


if __name__ == "__main__":
    main()
