"""Entry shim (reference run_main_ul.py)."""
from menghini_neurips23_tpu.runners.main_ul import main

if __name__ == "__main__":
    main()
