"""pyjac_tpu.testers subpackage."""
