"""pyjac_tpu.core subpackage."""
