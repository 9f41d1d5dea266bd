from .grids import second_deriv_prj, smooth_regularizer_coeff, norm
