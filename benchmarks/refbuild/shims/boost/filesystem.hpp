// std::filesystem-backed stand-in for the boost::filesystem calls used by
// the reference benchmark build (path/exists/create_directories/remove).
#pragma once
#include <filesystem>

namespace boost {
namespace filesystem {

using std::filesystem::create_directories;
using std::filesystem::exists;
using std::filesystem::path;
using std::filesystem::remove;

} // namespace filesystem
} // namespace boost
