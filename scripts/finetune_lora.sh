#!/bin/bash
# LoRA finetuning for original LLaVA v1.0 (ref scripts/finetune_lora.sh).
# For LLaVA-1.5 use scripts/v1_5/finetune_lora.sh. ZeRO-2 maps to the fsdp
# mesh axis (--dp/--tp flags select the mesh factorization).

PROMPT_VERSION=v1
MODEL_VERSION="vicuna-7b-v1.3"

python -m llava_plus_tpu.train.train \
    --lora-enable true \
    --model-name-or-path ./checkpoints/$MODEL_VERSION \
    --version $PROMPT_VERSION \
    --data-path ./playground/data/llava_instruct_80k.json \
    --image-folder ./playground/data/coco/train2017 \
    --vision-tower openai/clip-vit-large-patch14 \
    --pretrain-mm-mlp-adapter ./checkpoints/llava-$MODEL_VERSION-pretrain/mm_projector.bin \
    --mm-vision-select-layer -2 \
    --mm-use-im-start-end false \
    --mm-use-im-patch-token false \
    --bf16 true \
    --output-dir ./checkpoints/llava-$MODEL_VERSION-finetune_lora \
    --num-train-epochs 1 \
    --per-device-train-batch-size 16 \
    --learning-rate 2e-5 \
    --weight-decay 0. \
    --warmup-ratio 0.03 \
    --lr-scheduler-type cosine \
    --save-steps 50000 \
    --model-max-length 2048 \
    --gradient-checkpointing true \
    --lazy-preprocess true
