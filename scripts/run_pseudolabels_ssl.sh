#!/bin/bash
# Named wrapper (reference scripts/run_pseudolabels_ssl.sh — identical launch
# protocol to run_prompts_ssl.sh; the reference pair differs only in the MODEL
# list comment, e.g. textual_fpl/grip_* instead of *_prompt).
exec "$(dirname "$0")/run_prompts.sh" ssl
