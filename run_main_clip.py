"""Entry shim (reference run_main_clip.py)."""
from menghini_neurips23_tpu.runners.main_clip import main

if __name__ == "__main__":
    main()
