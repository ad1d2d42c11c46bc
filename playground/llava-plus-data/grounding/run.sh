#!/bin/bash
# Tool-instruction data generation driver for grounding skills
# (ref playground/llava-plus-data/grounding/run.sh). Produces training
# samples in the thoughts/actions/value grammar from box-annotated images.
python -m llava_plus_tpu.tools.generate_grounding_data \
    --question-file ./question_example_grounding.json \
    --output-file ./grounding_instruct.json \
    --num-samples 5000
