"""`python -m fwav_tpu` == the compress/decompress CLI."""

from .cli import main

main()
