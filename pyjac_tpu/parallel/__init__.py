"""pyjac_tpu.parallel subpackage."""
