"""Entry shim (reference run_main_trzsl.py)."""
from menghini_neurips23_tpu.runners.main_trzsl import main

if __name__ == "__main__":
    main()
