#!/bin/bash
# Named wrapper (reference scripts/run_prompts_trzsl.sh)
exec "$(dirname "$0")/run_prompts.sh" trzsl
