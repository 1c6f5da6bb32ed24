"""pyjac_tpu.ops subpackage."""
