// Headless stub: 2D Triangle meshing unused by the 3D binary (DIM==3).
#pragma once
#include <Eigen/Core>
#include <string>
#include <cstdlib>
namespace igl { namespace triangle {
template <class... A> inline void triangulate(A&&...) { std::abort(); }
}}
