from arreau_tpu.data.atoms import AtomicNumberTable, MASK_ATOMIC_NUMBER  # noqa: F401
