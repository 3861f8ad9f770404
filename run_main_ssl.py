"""Entry shim (reference run_main_ssl.py)."""
from menghini_neurips23_tpu.runners.main_ssl import main

if __name__ == "__main__":
    main()
