#!/bin/bash
# Long-context finetune via ring-attention sequence parallelism — a
# capability BEYOND the reference (its only sequence levers were gradient
# checkpointing + 4-bit weights; SURVEY.md §2.C).
#
# The sequence dim shards over --mesh_sp chips: per-chip activation memory
# scales S/sp, so a v5e-4 slice trains 4× the single-chip context.  KV
# shards rotate over ICI (ops/ring_attention.py — per-chunk Pallas flash
# kernels, exact gradients); weights stay replicated (LoRA state is tiny).
# Compose more throughput with --mesh_dp; batches pad S to a multiple of sp.
python -m qlora_tpu.cli \
    --model_name_or_path huggyllama/llama-7b \
    --output_dir ./output/guanaco-7b-longctx \
    --logging_steps 10 \
    --save_strategy steps \
    --save_steps 250 \
    --save_total_limit 40 \
    --group_by_length true \
    --do_train true \
    --lora_r 64 \
    --lora_alpha 16 \
    --double_quant true \
    --quant_type nf4 \
    --bits 4 \
    --warmup_ratio 0.03 \
    --lr_scheduler_type constant \
    --dataset oasst1 \
    --source_max_len 2048 \
    --target_max_len 6144 \
    --per_device_train_batch_size 1 \
    --gradient_accumulation_steps 16 \
    --max_steps 1875 \
    --learning_rate 0.0002 \
    --adam_beta2 0.999 \
    --max_grad_norm 0.3 \
    --lora_dropout 0.1 \
    --weight_decay 0.0 \
    --seed 0 \
    --mesh_sp 4
