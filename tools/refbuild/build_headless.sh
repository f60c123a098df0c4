#!/bin/bash
# Headless build of the reference DOT binary (viewer/png/triangle/tetgen
# stubbed; vendored SuiteSparse; oneTBB from the system).
set -e
cd /tmp/refsrc
SS=/tmp/refsrc/SuiteSparse
INC="-Istub -Ilibigl/include -Ilibigl/external/eigen -Isrc -Isrc/Energy \
 -Isrc/Energy/Physics_Elasticity -Isrc/Utils -Isrc/LinSysSolver \
 -Isrc/TimeStepper -Isrc/Utils/SVD -Isrc/Utils/SVD_EFTYCHIOS -I$SS/include \
 -I$SS/CHOLMOD/Include -I$SS/SuiteSparse_config"
FLAGS="-O3 -mavx2 -mfma -pthread -fopenmp -DUSE_AVX_IMPLEMENTATION -DNDEBUG -std=c++14 -w"
SRCS="src/main.cpp src/Config.cpp src/AnimScripter.cpp src/Mesh.cpp \
 src/Energy/Energy.cpp src/Energy/Physics_Elasticity/StableNHEnergy.cpp \
 src/Energy/Physics_Elasticity/FixedCoRotEnergy.cpp \
 src/Utils/IglUtils.cpp \
 src/LinSysSolver/EigenLibSolver.cpp src/LinSysSolver/CHOLMODSolver.cpp \
 src/TimeStepper/Optimizer.cpp src/TimeStepper/ADMMTimeStepper.cpp \
 src/TimeStepper/DOTTimeStepper.cpp src/TimeStepper/ADMMDDTimeStepper.cpp \
 src/TimeStepper/LBFGSTimeStepper.cpp \
 src/Utils/SVD_EFTYCHIOS/PTHREAD_QUEUE.cpp \
 src/Utils/SVD_EFTYCHIOS/Singular_Value_Decomposition_Helper.cpp"
LIBS="$SS/CHOLMOD/Lib/libcholmod.a $SS/AMD/Lib/libamd.a \
 $SS/CAMD/Lib/libcamd.a $SS/CCOLAMD/Lib/libccolamd.a \
 $SS/COLAMD/Lib/libcolamd.a $SS/SuiteSparse_config/libsuitesparseconfig.a \
 $SS/lib/libmetis.so -l:liblapack.so.3 -l:libblas.so.3 -ltbb -lpthread -lgomp -lm -ldl"
mkdir -p build_headless
g++ $FLAGS $INC $SRCS $LIBS -Wl,-rpath,$SS/lib -o build_headless/DOT_bin
echo BUILD_OK
