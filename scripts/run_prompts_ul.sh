#!/bin/bash
# Named wrapper (reference scripts/run_prompts_ul.sh)
exec "$(dirname "$0")/run_prompts.sh" ul
