"""libacm_tpu — TPU-native InterPlay ACM/WAVC decode framework."""
