from doa_tpu.cli import main

main()
