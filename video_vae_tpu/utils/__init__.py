from video_vae_tpu.utils.metrics import count_params, masked_psnr  # noqa: F401
