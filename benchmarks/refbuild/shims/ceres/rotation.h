// Empty stand-in: the reference's Factor_ImageReprojCalib includes
// <ceres/rotation.h> but the benchmark build never calls anything from it.
#pragma once
