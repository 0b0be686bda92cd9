from arreau_tpu.ops.lattice import (  # noqa: F401
    matrix_to_params,
    lattice_from_params,
    encode_angles,
    decode_angles,
    frac_to_cart,
    cart_to_frac,
    cart_to_frac_without_mod,
    symmetrize_matrix,
    symmetric_matrix_to_vector,
    vector_to_symmetric_matrix,
    polar_decomposition,
    volume,
    sample_bravais_angles,
)
from arreau_tpu.ops.pbc import (  # noqa: F401
    SUPERCELLS,
    min_distance_pbc,
    pbc_neighbor_list,
    NeighborList,
)
from arreau_tpu.ops.windowing import polynomial_cutoff  # noqa: F401
from arreau_tpu.ops.fourier import gaussian_fourier_features, make_fourier_weights  # noqa: F401
