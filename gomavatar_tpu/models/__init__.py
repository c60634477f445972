from gomavatar_tpu.models.gom import GoMConfig, GoMStatics, init_gom, gom_forward, subdivide_gom
