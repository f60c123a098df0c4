// Headless stub: TetGen is an external tool; mode-2 case 3 is unsupported.
#pragma once
#include <cstdlib>
namespace igl { namespace copyleft { namespace tetgen {
template <class... A> inline int tetrahedralize(A&&...) { std::abort(); return 1; }
}}}
