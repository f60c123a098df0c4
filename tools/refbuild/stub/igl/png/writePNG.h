// Headless stub: screenshots are a no-op without a GL framebuffer.
#pragma once
#include <Eigen/Core>
#include <string>
namespace igl { namespace png {
template <class M>
inline bool writePNG(const M&, const M&, const M&, const M&,
                     const std::string&) { return true; }
}}
