#!/bin/bash
# Named wrapper (reference scripts/run_prompts_ssl.sh)
exec "$(dirname "$0")/run_prompts.sh" ssl
